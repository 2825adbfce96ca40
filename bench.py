#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Each query is executed by a count()-style action that materializes the
full result (no collect of payload rows to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY
    from kinesis_to_opensearch_lambda_spark.session import get_session

    spark = get_session(app_name="bench", cpus=CPUS)

    headline = [q for q in REGISTRY.values() if q.headline]
    # Warm each query twice (JVM JIT needs a few iterations on the
    # codegen'd json/hash paths; plus parquet footers + AQE stats) so the
    # timed pass measures steady-state execution, not first-run codegen.
    for _ in range(2):
        for q in headline:
            q.spark(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for q in headline:
        t0 = time.perf_counter()
        df = q.spark(spark, SF_DIR)
        n = df.count()
        timings[q.name] = round(time.perf_counter() - t0, 3)
        print(f"# {q.name}: {timings[q.name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
