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
