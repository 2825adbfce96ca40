#!/usr/bin/env python
"""Pre-snapshot gate: a registry addition can never ship red.

Run this as the FINAL act of every round, against the about-to-commit
tree (r11 verdict task 2 — three rounds in a row a final-commit registry
entry landed with no driver-window seat, no sweep evidence, and a red
``test_driver_window_standing_invariant``).  The gate re-runs exactly
the checks a late registration historically dodged:

1. the standing driver-window invariant (window == first 50 registry
   entries; every CHANGED_THIS_ROUND entry seated; no verification
   orphans; rotation takes the oldest driver rows) — via pytest so the
   gate can never drift from the test it enforces;
2. the changed-entry evidence discipline: every name in
   CHANGED_THIS_ROUND must appear in at least one
   ``sweeps/*_r{DRIVER_WINDOW_ROUND}.json`` artifact (sf-scale parity /
   determinism evidence recorded THIS round, not inherited);
3. SURVEY.md §12 is current (``tools/survey_status.py --check``).

Exit 0 = safe to snapshot.  Non-zero = fix before committing; the
failure message names the entries carrying debt.

Usage:  python tools/presnapshot_gate.py
        python tools/presnapshot_gate.py --skip-pytest   # evidence+survey only
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    failures: list[str] = []

    if "--skip-pytest" not in sys.argv:
        for target in (
            "tests/test_harness_integrity.py::test_driver_window_standing_invariant",
        ):
            r = subprocess.run(
                [sys.executable, "-m", "pytest", target, "-q", "-p", "no:cacheprovider"],
                cwd=REPO,
                capture_output=True,
                text=True,
            )
            if r.returncode != 0:
                failures.append(
                    f"{target} FAILED:\n{r.stdout[-2000:]}"
                )

    from tests.test_harness_integrity import CHANGED_THIS_ROUND
    from kinesis_to_opensearch_lambda_spark.queries import DRIVER_WINDOW_ROUND

    sweep_dir = os.path.join(REPO, "sweeps")
    round_artifacts = [
        os.path.join(sweep_dir, f)
        for f in os.listdir(sweep_dir)
        if f.endswith(f"_r{DRIVER_WINDOW_ROUND:02d}.json")
        or f.endswith(f"_r{DRIVER_WINDOW_ROUND}.json")
    ]
    blob = "".join(
        open(p, encoding="utf-8", errors="replace").read() for p in round_artifacts
    )
    missing = sorted(n for n in CHANGED_THIS_ROUND if n not in blob)
    if missing:
        failures.append(
            "changed entries with NO sweep artifact this round "
            f"(r{DRIVER_WINDOW_ROUND}): {missing} — run the changed-entry "
            "discipline (sf1/sf10 parity + partition determinism) and "
            "record a sweeps/SWEEP_*_r{round}.json naming each entry"
        )

    r = subprocess.run(
        [sys.executable, "tools/survey_status.py", "--check"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        failures.append(f"SURVEY.md §12 stale: {r.stdout.strip()}")

    if failures:
        print("PRESNAPSHOT GATE: FAIL")
        for f in failures:
            print(" -", f)
        return 1
    print(
        "PRESNAPSHOT GATE: OK "
        f"(round r{DRIVER_WINDOW_ROUND}, {len(CHANGED_THIS_ROUND)} changed "
        f"entries evidenced across {len(round_artifacts)} artifacts)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
