"""truncate_lineage durability knob (operators/lineage.py).

The explicit ``checkpoint_dir`` argument always wins; when callers pass
None (every registry builder — the (spark, sf_dir) signature cannot
carry the knob) the SPARK_GRAFT_CHECKPOINT_DIR env var switches the cut
to a reliable checkpoint().  This is how tools/sweep.py
--checkpoint-dir closes the r9 GCLocker/localCheckpoint-eviction
session-death class without touching any call site.
"""

from __future__ import annotations

import os

from kinesis_to_opensearch_lambda_spark.operators.lineage import (
    CHECKPOINT_DIR_ENV,
    truncate_lineage,
)


def _n_files(d: str) -> int:
    return sum(len(fs) for _, _, fs in os.walk(d))


def test_explicit_dir_writes_reliable_checkpoint(spark, tmp_path):
    ckpt = str(tmp_path / "explicit")
    out = truncate_lineage(spark.range(100), ckpt, eager=True)
    assert out.count() == 100
    # File presence IS the durability evidence (out.rdd wraps a fresh
    # javaToPython RDD, so isCheckpointed() can't observe the cut).
    assert _n_files(ckpt) > 0, "reliable checkpoint wrote no files"


def test_env_var_fallback_writes_reliable_checkpoint(spark, tmp_path, monkeypatch):
    ckpt = str(tmp_path / "from-env")
    monkeypatch.setenv(CHECKPOINT_DIR_ENV, ckpt)
    out = truncate_lineage(spark.range(100), None, eager=True)
    assert out.count() == 100
    assert _n_files(ckpt) > 0, "env-var checkpoint dir got no files"


def test_default_stays_local(spark, monkeypatch, tmp_path):
    # No env var, no explicit dir: the cut is executor-local — no
    # files appear in a candidate dir, and execution succeeds.
    monkeypatch.delenv(CHECKPOINT_DIR_ENV, raising=False)
    probe = str(tmp_path / "never-used")
    out = truncate_lineage(spark.range(10), None, eager=True)
    assert out.count() == 10
    assert not os.path.exists(probe)


def test_empty_env_var_means_local(spark, monkeypatch):
    # An exported-but-empty var (e.g. SPARK_GRAFT_CHECKPOINT_DIR= in a
    # wrapper script) must not become setCheckpointDir("").
    monkeypatch.setenv(CHECKPOINT_DIR_ENV, "")
    out = truncate_lineage(spark.range(10), None, eager=True)
    assert out.count() == 10
