#!/usr/bin/env python
"""Interleaved same-session A/B of fan_out on vs off for given queries.

Usage: python tools/fanout_ab.py <name[,name...]> [SF_DIR] [CPUS] [ITERS]

The B leg monkeypatches every operator module's ``fan_out`` binding to
identity (they import it by name), so both variants run in ONE session,
alternating, which is the only honest comparison on a noisy shared host
(see OPTIMIZATION_r13.md "Measurement setup").  Timing is the noop sink
(guide §1.4).  This is a *measurement* tool: winners get their call
site edited in code afterwards; the patch never ships.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = [n.strip() for n in sys.argv[1].split(",") if n.strip()]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY
    from kinesis_to_opensearch_lambda_spark.session import get_session
    import kinesis_to_opensearch_lambda_spark.operators as ops_pkg
    import importlib
    import pkgutil

    # Collect every operators submodule that re-binds fan_out.
    mods = []
    for m in pkgutil.iter_modules(ops_pkg.__path__):
        mod = importlib.import_module(f"{ops_pkg.__name__}.{m.name}")
        if hasattr(mod, "fan_out"):
            mods.append(mod)
    orig = mods[0].fan_out

    def identity(df, min_factor=2):
        return df

    def set_fanout(on: bool) -> None:
        for mod in mods:
            mod.fan_out = orig if on else identity

    spark = get_session(app_name="fanout-ab", cpus=cpus)
    out: dict[str, dict] = {}
    for name in names:
        q = REGISTRY[name]
        for on in (True, False):  # warm both variants once
            set_fanout(on)
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = {"on": [], "off": []}
        for i in range(iters):
            for on in (True, False):
                set_fanout(on)
                leg = "on" if on else "off"
                spark.sparkContext.setJobDescription(f"{name}:{leg}:{i}")
                t0 = time.perf_counter()
                q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
                sec = time.perf_counter() - t0
                samples[leg].append(round(sec, 3))
                print(f"# {name} {leg} {i + 1}/{iters}: {sec:.3f}s", file=sys.stderr)
        set_fanout(True)
        out[name] = {
            "on_median": round(statistics.median(samples["on"]), 3),
            "off_median": round(statistics.median(samples["off"]), 3),
            "on": samples["on"],
            "off": samples["off"],
        }
    print(json.dumps({"metric": "fanout_ab", "sf_dir": sf_dir, "cpus": cpus, "queries": out}))


if __name__ == "__main__":
    main()
