"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) for
the Kinesis-envelope JSONL format — a connector with NO JVM jar.

The reference consumes AWS-shaped records `{"kinesis": {"data":
base64(json)}}` pushed by the Kinesis trigger (lambda_function.py:
140-141, 45).  The real Structured Streaming Kinesis connector is a JVM
package that is absent from this image (sources/kinesis.py probes for
it); this module shows the OTHER production answer when no jar exists
for a niche source: implement the source in pure Python against Spark's
DataSource V2 Python API.  Spark distributes one `InputPartition` per
envelope file to executors and runs the generator there — parallel,
executor-side, no driver collect; the rows cross into the JVM via
Arrow batches (this is sanctioned batched Python, same budget class as
mapInPandas, and it exists only at the ingest edge — everything
downstream is codegen'd DataFrame ops).

At 100 TB the partitions() listing would come from the object-store
manifest and each partition would map to one S3 object / shard
checkpoint range; the per-partition generator shape is identical.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class EnvelopeFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class KinesisEnvelopeJsonlSource(DataSource):
    """`spark.read.format("kinesis_envelope_jsonl").load(dir)`."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_envelope_jsonl"

    def schema(self) -> str:
        return "kinesis_data string"

    def reader(self, schema) -> "KinesisEnvelopeJsonlReader":  # noqa: ANN001
        return KinesisEnvelopeJsonlReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: ANN001, ANN201
        return KinesisEnvelopeJsonlStreamReader(self.options)


class KinesisEnvelopeJsonlReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kinesis_envelope_jsonl requires a path")

    def partitions(self):  # noqa: ANN201 - base signature
        import glob
        import os

        return [
            EnvelopeFilePartition(p)
            for p in sorted(glob.glob(os.path.join(self.path, "part-*")))
        ]

    def read(self, partition):  # noqa: ANN001, ANN201 - base signature
        import json

        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield (rec["kinesis"]["data"],)


class KinesisEnvelopeJsonlStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector: offset = high-water FILENAME.

    One file per `read()` call, so every envelope file becomes its own
    micro-batch (the same drain shape the file-source streaming queries
    pin with maxFilesPerTrigger=1).  The offset records the basename of
    the last consumed file, NOT a positional index (r5 ADVICE): an
    integer index into a freshly re-sorted listing re-maps to different
    files if a lexically earlier name appears (or one is removed)
    between commit and restart.  With a name high-water mark,
    `readBetweenOffsets` replays the committed (start, end] range by
    NAME comparison — deterministic under listing churn — and `read()`
    skips late-arriving older names exactly like Spark's built-in file
    source does past its processed-log high-water mark.
    """

    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kinesis_envelope_jsonl requires a path")

    def _files(self):  # noqa: ANN202
        import glob
        import os

        return sorted(glob.glob(os.path.join(self.path, "part-*")))

    def _rows_of(self, path: str):  # noqa: ANN202
        import json

        out = []
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    out.append((json.loads(line)["kinesis"]["data"],))
        return out

    @staticmethod
    def _name(path: str) -> str:
        import os

        return os.path.basename(path)

    def _pos(self, offset: dict) -> str:
        """Name high-water mark of an offset, accepting the legacy
        ``{"idx": N}`` shape (r6 ADVICE): the r5-era offset counted
        files consumed from the sorted listing, so a checkpoint written
        by that version restarts here by translating the count to the
        basename of the N-th consumed file (idx=0 -> "" = nothing
        consumed).  Clamped so an idx past the current listing means
        "everything consumed" rather than an IndexError."""
        if "pos" in offset:
            return offset["pos"]
        if "idx" in offset:
            i = min(int(offset["idx"]), len(files := self._files()))
            pos = self._name(files[i - 1]) if i > 0 else ""
            # best-effort migration maps the count onto the CURRENT
            # sorted listing; log the translated boundary (r7 ADVICE)
            # so a listing that shifted between checkpoint and restart
            # (deleted file, earlier-sorting arrival) is diagnosable
            # from the stream logs instead of silently skipping/re-
            # reading one file.
            import logging

            logging.getLogger(__name__).warning(
                "legacy offset {'idx': %s} translated to name high-water "
                "mark %r over a %d-file listing",
                offset["idx"],
                pos,
                len(files),
            )
            return pos
        raise ValueError(f"unrecognized offset shape: {offset!r}")

    def initialOffset(self) -> dict:
        return {"pos": ""}  # "" sorts before every part-* basename

    def read(self, start: dict):  # noqa: ANN201 - base signature
        pos = self._pos(start)
        pending = [p for p in self._files() if self._name(p) > pos]
        if not pending:
            return iter([]), {"pos": pos}
        nxt = pending[0]
        return iter(self._rows_of(nxt)), {"pos": self._name(nxt)}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: ANN201
        lo, hi = self._pos(start), self._pos(end)
        rows = []
        for p in self._files():
            if lo < self._name(p) <= hi:
                rows.extend(self._rows_of(p))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass
