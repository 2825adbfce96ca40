#!/usr/bin/env python
"""Full-registry parity sweep at an arbitrary scale factor.

Usage: python tools/sweep.py [SF_DIR] [CPUS] [ONLY]

Runs every registered query against $SF_DIR (default /root/testdata/sf0.1)
and compares rows + schema + value-hash with its DuckDB oracle — the same
comparator strictness as the driver's CORRECTNESS gate.  This is the
discipline that caught the round-4 stream-stream-join OOM: correctness at
sf0.001 does not prove the plan survives 100x the data.

ONLY (optional) restricts the sweep to a comma-separated list of query
names and/or name prefixes (e.g. "streaming_,graph_,tpch_q1_pricing") —
used for the sf1 stress subset where a full-registry pass is hours.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "16"
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY
    from kinesis_to_opensearch_lambda_spark.session import get_session
    from tests.oracle_compare import assert_parity

    spark = get_session(app_name="sweep", cpus=cpus)
    names = sorted(
        n
        for n in REGISTRY
        if only is None or any(n == o or n.startswith(o) for o in only)
    )
    failed: list[str] = []
    timings: dict[str, float] = {}
    t_all = time.time()
    # Session recycling (r9): the sf10 headline sweep's first session
    # died of GCLocker allocation thrash after ~20 minutes of heavy
    # entries — an executor-local checkpoint block was evicted from the
    # sick JVM and every later entry cascade-failed on the dead session
    # (sweeps/SWEEP_SF10_r09.json).  A long sweep is many independent
    # queries, so bound the blast radius: restart the session after
    # every ~10 minutes of accumulated query wall time.  Cheap (one
    # ~8s JVM start per recycle) and each entry still runs in a
    # driver-equivalent fresh-conf session.
    recycle_budget_s = float(os.environ.get("SWEEP_RECYCLE_SEC", "600"))
    since_recycle = 0.0
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            assert_parity(spark, name, sf_dir)
            status = "ok"
        except Exception as exc:  # noqa: BLE001 - record and continue
            failed.append(name)
            status = f"FAIL {str(exc)[:300]}"
        timings[name] = round(time.time() - t0, 1)
        print(
            f"[{i + 1}/{len(names)}] {name}: {status} "
            f"({timings[name]:.1f}s)",
            flush=True,
        )
        since_recycle += timings[name]
        if since_recycle >= recycle_budget_s and i + 1 < len(names):
            print(f"# recycling session after {since_recycle:.0f}s", flush=True)
            spark.stop()
            spark = get_session(app_name="sweep", cpus=cpus)
            since_recycle = 0.0
    print(f"TOTAL {len(names)} in {time.time() - t_all:.0f}s")
    print("FAILED:", failed or "none")
    # machine-readable summary (one line, bench.py convention) so sweep
    # runs self-document per-query parity timings for the round record
    import json

    print(
        json.dumps(
            {
                "metric": "parity_sweep",
                "sf_dir": sf_dir,
                "n": len(names),
                "failed": failed,
                "queries": timings,
                "unit": "sec",
            }
        ),
        flush=True,
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
