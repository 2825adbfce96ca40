#!/usr/bin/env python
"""Driver-window pre-flight: run the EXACT first-50 registry entries
(the set the driver's CORRECTNESS gate will sample) in a vanilla
session with the driver-strict comparator, and write
``sweeps/WINDOW_PREFLIGHT_r{N}.json``.

Standing rotation step (r8+): after re-seating DRIVER_WINDOW each
round, this is the proof the rotated window is 50/50 green BEFORE the
driver ever sees it.  Previously re-written ad hoc every round — now a
tool so the pre-snapshot checklist is one command:

    python tools/window_preflight.py            # sf0.01, local[16]
    python tools/window_preflight.py SF_DIR CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "16"
    from kinesis_to_opensearch_lambda_spark.queries import (
        DRIVER_WINDOW_ROUND,
        REGISTRY,
    )
    from kinesis_to_opensearch_lambda_spark.session import get_session
    from tests.oracle_compare import timed_parity

    names = list(REGISTRY)[:50]
    spark = get_session(app_name="window_preflight", cpus=cpus)
    t0 = time.monotonic()
    entries: dict[str, dict] = {}
    failed: list[str] = []
    for i, n in enumerate(names, 1):
        t = time.monotonic()
        try:
            # timed_parity raises on any rows/schema/hash mismatch and
            # returns the spark/oracle/compare cost split on success
            splits = timed_parity(spark, n, sf_dir)
            ok, note = True, None
        except Exception as e:  # a mismatch is a preflight failure, not an abort
            ok, note, splits = False, f"{type(e).__name__}: {e}", {}
        sec = round(time.monotonic() - t, 1)
        entries[n] = {"ok": ok, "sec": sec, **splits}
        if note:
            entries[n]["err"] = note[:300]
        if not ok:
            failed.append(n)
        print(f"[{i}/50] {n}: {'ok' if ok else 'FAIL'} ({sec}s)", flush=True)
    art = {
        "what": (
            f"r{DRIVER_WINDOW_ROUND} DRIVER_WINDOW pre-flight after "
            "rotation: the exact 50 first-registry entries the driver "
            f"will gate, vanilla local[{cpus}] session at {sf_dir} with "
            "the driver-strict comparator"
        ),
        "n": len(names),
        "failed": failed,
        "total_sec": round(time.monotonic() - t0, 1),
        "entries": entries,
    }
    out = os.path.join(REPO, "sweeps", f"WINDOW_PREFLIGHT_r{DRIVER_WINDOW_ROUND}.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {out}; failed={failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
