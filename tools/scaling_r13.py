#!/usr/bin/env python
"""SCALING_r13: spark-side scaling exponents after the r13 rewrites.

Usage: python tools/scaling_r13.py [OUT] [GROUPS] [SFS] [RUNS]

Mirrors SCALING_r12's methodology (noop sink, best-of-N warm runs,
local[32]) and additionally records the COLD first pass per query —
for the kNN family that first pass pays the session-scoped bucketed
SRP index build, so cold-vs-warm separates index amortization from
per-query plan cost (the r12 verdict's open question was the WARM
1->10 decade exponent).

Isolation: one fresh interpreter+JVM per QUERY GROUP per scale factor.
Groups (';'-separated, ','-joined within a group) share one session —
the kNN pair is a group so ann_knn_graph_mutual_multitable reuses the
index emb_knn_loo_label_eval built, exactly like a production session
over a shared bucketed index table.  Everything else runs alone: the
first sf10 attempt ran all five queries in one 16g JVM and the
ACCUMULATED localCheckpoint blocks of four queries' repeated runs blew
the heap during the fifth (graph_triangle_count) — a harness artifact
(a cluster frees per-query executor storage at session scale-down; one
shared local JVM cannot), not a plan property, so the harness now
matches the per-query lifecycle.  A System.gc() nudge between runs
releases the driver-side RDD references that pin checkpoint blocks.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_GROUPS = [
    "emb_knn_loo_label_eval,ann_knn_graph_mutual_multitable",
    "dedup_semdedup_prune",
    "corpus_dsir_selection",
    "graph_triangle_count",
]


def _sf_dir(sf: str) -> str:
    d = f"/root/testdata/sf{sf}"
    if not os.path.isdir(d):
        # sf1/sf10 are the regenerable tiled sets under .scratch
        # (tools/gen_sf.py), matching the r9-r12 sweep convention.
        d = os.path.join(REPO, ".scratch", f"sf{sf}")
    return d


def run_group(sf: str, names: list[str], runs: int) -> dict[str, dict]:
    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY
    from kinesis_to_opensearch_lambda_spark.session import get_session

    sf_dir = _sf_dir(sf)
    spark = get_session(app_name=f"scaling-r13-sf{sf}", cpus="32")
    out: dict[str, dict] = {}
    for name in names:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"cold:{name}:sf{sf}")
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        warm = []
        for r in range(runs):
            import gc

            gc.collect()  # drop py4j refs so ContextCleaner can free
            spark.sparkContext._jvm.System.gc()  # prior runs' checkpoint blocks
            spark.sparkContext.setJobDescription(f"warm:{name}:sf{sf}:{r}")
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm.append(round(time.perf_counter() - t0, 2))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"cold": round(cold, 2), "warm": warm, "best": min(warm)}
        print(f"# sf{sf} {name}: cold {cold:.2f}s warm {warm}", file=sys.stderr)
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one-group":
        sf = sys.argv[2]
        names = sys.argv[3].split(",")
        runs = int(sys.argv[4])
        print(json.dumps(run_group(sf, names, runs)))
        return

    out_path = sys.argv[1] if len(sys.argv) > 1 else "sweeps/SCALING_r13.json"
    groups = (
        [g.split(",") for g in sys.argv[2].split(";")]
        if len(sys.argv) > 2
        else [g.split(",") for g in DEFAULT_GROUPS]
    )
    sfs = sys.argv[3].split(",") if len(sys.argv) > 3 else ["0.1", "1", "10"]
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    import subprocess

    per_sf: dict[str, dict] = {sf: {} for sf in sfs}
    for sf in sfs:
        for group in groups:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--one-group",
                    sf,
                    ",".join(group),
                    str(runs),
                ],
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            sys.stderr.write(proc.stderr)
            if proc.returncode != 0:
                print(f"sf{sf} group {group} FAILED rc={proc.returncode}",
                      file=sys.stderr)
                continue
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            per_sf[sf].update(json.loads(line))

    names = [n for g in groups for n in g]
    queries: dict[str, dict] = {}
    for name in names:
        entry: dict = {}
        for sf in sfs:
            if name in per_sf.get(sf, {}):
                entry[sf] = per_sf[sf][name]
        pairs = [(a, b) for a, b in zip(sfs, sfs[1:]) if a in entry and b in entry]
        exps = {}
        for a, b in pairs:
            ratio = entry[b]["best"] / max(entry[a]["best"], 1e-9)
            exps[f"{a}_to_{b}"] = round(
                math.log(ratio) / math.log(float(b) / float(a)), 3
            )
        entry["exponent_per_decade"] = exps
        queries[name] = entry
    result = {
        "metric": "spark_side_scaling_r13",
        "note": (
            "noop sink, best-of-%d WARM runs after one recorded COLD pass, "
            "local[32], fresh session per query group per sf (kNN pair shares "
            "one session: emb_knn_loo_label_eval runs first and pays the "
            "shared bucketed-SRP-index build, ann_knn_graph_mutual_multitable "
            "reuses it — the index-amortized leg the r12 verdict asked to "
            "pin); exponent = log(t_b/t_a)/log(sf_b/sf_a), 1.0 = linear in "
            "data." % runs
        ),
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
