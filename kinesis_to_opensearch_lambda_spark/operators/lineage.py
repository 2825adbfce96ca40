"""Lineage truncation for iterative operators (pagerank, label
propagation, connected components).

Iterative DataFrame algorithms grow an O(rounds)-deep plan unless each
round's result is checkpointed.  Two modes:

- ``checkpoint_dir=None`` → ``localCheckpoint``: blocks live on
  executors.  Fast (no FS round-trip) and right for local / short jobs,
  but an executor loss on a real cluster drops blocks whose lineage has
  been truncated — the job cannot recover.
- ``checkpoint_dir=<path>`` → reliable ``checkpoint()`` against a
  fault-tolerant filesystem (HDFS/S3/NFS): survives executor loss, at
  the cost of a write + an extra computation of the checkpointed round
  (Spark recomputes the RDD when materializing a reliable checkpoint;
  for these operators each round is one join + one aggregation, so the
  overhead is a constant factor on the round, not the job).

This is the knob the round-4 verdict asked for: durability is a
parameter, not a docstring promise.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Deployment-level override: when a caller passes checkpoint_dir=None
# (every registered query builder does — the registry signature is
# (spark, sf_dir) and cannot thread the knob), this env var switches
# ALL lineage cuts to reliable checkpoints at once.  Motivation
# (r9 sweep, SWEEP_SF10_r09.json): a long heavy-entry session died of
# GCLocker allocation thrash evicting a localCheckpoint block mid-CC —
# executor-local blocks share the sick JVM's fate, reliable checkpoint
# files do not.  tools/sweep.py sets it from --checkpoint-dir; on a
# real cluster set it to an HDFS/S3 path in spark-env.
CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def truncate_lineage(
    df: DataFrame, checkpoint_dir: str | None, eager: bool = True
) -> DataFrame:
    """Cut ``df``'s lineage: reliable ``checkpoint()`` into
    ``checkpoint_dir`` when set, else executor-local
    ``localCheckpoint()``.  Eager by default — iterative callers want
    the materialization job to run now so the next round's plan starts
    from the checkpoint.

    An explicit ``checkpoint_dir`` argument wins; when it is None the
    ``SPARK_GRAFT_CHECKPOINT_DIR`` env var is consulted so whole
    deployments (sweeps, cluster jobs running registry builders whose
    signature cannot carry the knob) can opt into reliable checkpoints
    without touching call sites."""
    if checkpoint_dir is None:
        checkpoint_dir = os.environ.get(CHECKPOINT_DIR_ENV) or None
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)


# Byte budget for executor-local cuts, as a fraction of executor heap.
# localCheckpoint stores the materialized partitions as DESERIALIZED
# row objects in executor storage memory (MEMORY_AND_DISK unrolls in
# heap first); a frame whose row-object mass approaches the heap turns
# the cut from a planning-dedup win into an allocation storm — measured
# r13 at sf10: graph_triangle_count's three edge-scale cuts (~100M+
# two-long rows each) hard-OOMed a fresh 16 GiB local[32] JVM, while
# the UNCUT r9 form of the same query ran 224s there (runtime exchange
# reuse already dedups the physical work; the cut only removes
# duplicated planning/broadcast overhead, which AMORTIZES at scale).
# heap/64 with the measured ~6-12x deserialized-object blowup over
# source parquet bytes and up to 3 live cuts per query keeps the
# materialized mass comfortably under half the heap.
_CUT_BUDGET_ENV = "SPARK_GRAFT_LINEAGE_CUT_MAX_MB"
_CUT_HEAP_FRACTION = 64


def _heap_bytes(df: DataFrame) -> int:
    conf = df.sparkSession.sparkContext.getConf()
    raw = conf.get("spark.executor.memory", None) or conf.get(
        "spark.driver.memory", "1g"
    )
    units = {"k": 10, "m": 20, "g": 30, "t": 40}
    raw = raw.strip().lower()
    if raw[-1] in units:
        return int(float(raw[:-1]) * (1 << units[raw[-1]]))
    return int(raw)


def _scan_bytes(source: DataFrame) -> int:
    """Bytes of ``source``'s file scan; 'huge' when unknowable (a
    derived/in-memory source gives no files — treat as over budget so
    the guard fails safe toward NOT materializing)."""
    files = source.inputFiles()
    if not files:
        return 1 << 62
    total = 0
    for uri in files:
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        try:
            total += os.path.getsize(path)
        except OSError:
            return 1 << 62
    return total


def truncate_lineage_scaled(
    df: DataFrame,
    checkpoint_dir: str | None,
    source: DataFrame,
    eager: bool = False,
) -> DataFrame:
    """Cut ``df``'s lineage only when materializing it is safe here.

    - A reliable checkpoint dir (argument or $SPARK_GRAFT_CHECKPOINT_DIR)
      always cuts: the blocks land on a fault-tolerant FS, not in
      executor heap — the cluster deployment path.
    - Executor-local cuts are byte-guarded: cut only while ``source``'s
      scan is under heap/64 (override: $SPARK_GRAFT_LINEAGE_CUT_MAX_MB).
      Above budget ``df`` is returned UNCUT — results are identical
      either way (a cut never changes expressions), the duplicated
      subtrees are deduped physically by runtime exchange reuse, and
      the fixed planning overhead the cut saves is amortized by the
      very scale that made the cut unsafe.
    """
    if checkpoint_dir is None:
        checkpoint_dir = os.environ.get(CHECKPOINT_DIR_ENV) or None
    if checkpoint_dir is not None:
        return truncate_lineage(df, checkpoint_dir, eager=eager)
    env = os.environ.get(_CUT_BUDGET_ENV)
    budget = (
        int(float(env) * (1 << 20))
        if env
        else _heap_bytes(df) // _CUT_HEAP_FRACTION
    )
    if _scan_bytes(source) <= budget:
        return truncate_lineage(df, None, eager=eager)
    return df
