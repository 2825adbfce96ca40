#!/usr/bin/env python
"""Partition-count determinism sweep: every registry query's value hash
must be IDENTICAL under different shuffle-partition counts.

The sf10 parity run caught tpch_q1's double-sum drifting with partition
count (reassociation of parallel partial sums) — a result that silently
depends on the cluster layout is wrong at 100 TB even when every
fixed-layout parity check passes.  This sweep runs each query twice in
the same session with spark.sql.shuffle.partitions set to a small and a
large value (plus repartitioned inputs via the session's normal reader)
and hash-compares the materialized results.

Usage: python tools/partition_determinism.py [SF_DIR] [P_LO] [P_HI] [ONLY] [CONF]
           [--checkpoint-dir DIR]

CONF (default spark.sql.shuffle.partitions) is the session conf swept
between the two values — e.g. pass spark.sql.adaptive.enabled with
values false/true to assert AQE's runtime re-planning (partition
coalescing, skew splits) never changes a result, only its plan.

--checkpoint-dir DIR (r10 queue item 5, same seam as tools/sweep.py):
exports SPARK_GRAFT_CHECKPOINT_DIR so iterative operators' lineage
cuts use reliable checkpoint() files in DIR instead of
executor-local localCheckpoint blocks — long determinism sweeps over
the iterative/graph entries get the same GCLocker-eviction robustness
the parity sweep gained in r10 (sweeps/SWEEP_SF10_HEAVY_r10.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = list(sys.argv[1:])
    checkpoint_dir = None
    if "--checkpoint-dir" in argv:
        i = argv.index("--checkpoint-dir")
        checkpoint_dir = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    p_lo = argv[1] if len(argv) > 1 else "3"
    p_hi = argv[2] if len(argv) > 2 else "32"
    only = argv[3].split(",") if len(argv) > 3 else None
    conf_key = argv[4] if len(argv) > 4 else "spark.sql.shuffle.partitions"
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = checkpoint_dir
        print(f"# reliable checkpoints -> {checkpoint_dir}", file=sys.stderr)

    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY
    from kinesis_to_opensearch_lambda_spark.session import get_session
    from tests.oracle_compare import _rows

    spark = get_session(app_name="partition-determinism", cpus="16")
    # Restore the session factory's own default after each query (r7
    # ADVICE: the old code hardcoded '16', silently overriding the
    # configured default when sweeping a non-shuffle conf key).
    pre_sweep_shuffle = spark.conf.get("spark.sql.shuffle.partitions")

    names = [
        n
        for n, q in REGISTRY.items()
        if q.oracle is not None
        and (only is None or any(n == o or n.startswith(o) for o in only))
    ]
    failed, timings = [], {}
    t_all = time.time()
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        hashes = []
        try:
            for p in (p_lo, p_hi):
                spark.conf.set(conf_key, p)
                hashes.append(_rows(q.spark(spark, sf_dir).toPandas()))
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"# {name}: ERROR {type(exc).__name__}: {exc}"[:200],
                  file=sys.stderr)
            continue
        finally:
            spark.conf.unset(conf_key)
            spark.conf.set("spark.sql.shuffle.partitions", pre_sweep_shuffle)
        ok = hashes[0] == hashes[1]
        if not ok:
            failed.append(name)
        timings[name] = round(time.time() - t0, 1)
        print(f"# {name}: {'ok' if ok else 'HASH MISMATCH'} "
              f"({timings[name]}s)", file=sys.stderr)
    out = {
        "metric": "partition_determinism",
        "sf_dir": sf_dir,
        "conf": conf_key,
        "values": [p_lo, p_hi],
        "n": len(names),
        "failed": failed,
        "total_sec": round(time.time() - t_all, 1),
    }
    if checkpoint_dir:
        out["checkpoint_dir"] = checkpoint_dir
        out["checkpoint_files"] = sum(
            len(fs) for _, _, fs in os.walk(checkpoint_dir)
        )
    print(json.dumps(out))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
