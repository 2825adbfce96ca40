#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/plan_dump.py <tag> <suffix> <name[,name...]|headline|frontier|all> [SF_DIR]

The optimization-round evidence convention (r13): the judge checks plan
claims (Exchange counts, join strategies, PushedFilters) against these
committed files, so every optimized query gets a _before and _after dump.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    which = sys.argv[3]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"

    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY
    from kinesis_to_opensearch_lambda_spark.session import get_session

    if which == "headline":
        names = [n for n, q in REGISTRY.items() if q.headline]
    elif which == "frontier":
        from bench import FRONTIER

        names = [n for n in FRONTIER if n in REGISTRY]
    elif which == "all":
        names = list(REGISTRY)
    else:
        names = [n.strip() for n in which.split(",") if n.strip()]

    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="plan-dump", cpus="8")
    for name in names:
        q = REGISTRY[name]
        try:
            df = q.spark(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record and continue
            plan = f"PLAN DUMP FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n\n{plan}\n")
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
