"""Observability (SURVEY.md §2A R17).

The reference prints ``success/total`` per sink invocation
(lambda_function.py:87-88,137-138).  The engine's distributed
equivalents:

- sink-side accumulators (sinks.base — per-chunk success/total);
- ``Observation`` metrics riding the batch plan: counts computed during
  the write pass itself, no second scan of the input;
- a ``StreamingQueryListener`` for per-micro-batch progress (rows/sec,
  input counts) on long-running streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observed(df: DataFrame, name: str = "pipeline") -> tuple[DataFrame, Observation]:
    """Attach plan-side counters: total rows and null-key records seen.

    ``observation.get`` is available after the first *DataFrame* action
    on the returned frame (write/collect/count) — the metrics are
    computed inside the same pass that executed the action, zero extra
    scans.  NB: ``foreachPartition`` is an RDD action and does not fire
    observation metrics — transport sinks count via accumulators instead
    (sinks.base); use this for writer-based sinks (parquet/noop).
    """
    obs = Observation(name)
    key = "random_id" if "random_id" in df.columns else df.columns[0]
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(key).isNull(), 1).otherwise(0)).alias("n_null_key"),
    )
    return out, obs


class BatchProgressListener(StreamingQueryListener):
    """Collects per-micro-batch input row counts — the streaming
    analogue of the reference's per-invocation success prints."""

    def __init__(self) -> None:
        self.batches: list[tuple[int, int]] = []  # (batchId, numInputRows)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append((p.batchId, p.numInputRows))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return sum(n for _, n in self.batches)
