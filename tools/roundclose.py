"""One-command round-close battery (promotes the README checklist from
prose to a tool, so no step can be silently omitted under time pressure).

    python tools/roundclose.py           # full battery, ordered, exit != 0 on any red
    python tools/roundclose.py --fast    # skip the two long steps (pytest, sweep3 --full)
                                         # — the pre-commit subset for lane-touching edits

Order is deliberate: the two load-SENSITIVE steps (benchfloor's prepared
medians, perfsweep's per-lane medians) run FIRST while the machine is
quiet; the load-insensitive correctness sweeps follow and can share the
box with anything. Each step is a subprocess so one step's Spark session
(or crash) can't contaminate the next. A summary lands in
``DIAG/roundclose_summary.json`` with per-step exit codes, durations, and
the last line of output — the artifact a verdict can quote directly.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, argv, long) — long steps are skipped under --fast
_STEPS: list[tuple[str, list[str], bool]] = [
    ("benchfloor", [sys.executable, "tools/benchfloor.py"], False),
    (
        "perfsweep",
        [
            sys.executable,
            "tools/perfsweep.py",
            "/root/testdata/sf0.1",
            "--baseline",
            "tools/perf_baseline.json",
            "--tolerance",
            "3.0",
        ],
        False,
    ),
    ("planlint", [sys.executable, "tools/planlint.py"], False),
    ("shufflebudget", [sys.executable, "tools/shufflebudget.py"], False),
    ("schemaaudit", [sys.executable, "tools/schemaaudit.py"], False),
    ("fpstability", [sys.executable, "tools/fpstability.py"], False),
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], True),
    ("sweep3-full", [sys.executable, "tools/sweep3.py", "--full"], True),
]


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    results: dict[str, dict] = {}
    failed: list[str] = []
    for name, argv, long_step in _STEPS:
        if fast and long_step:
            results[name] = {"skipped": "--fast"}
            print(f"SKIP  {name} (--fast)")
            continue
        t0 = time.time()
        proc = subprocess.run(
            argv, cwd=REPO, capture_output=True, text=True, check=False
        )
        dur = round(time.time() - t0, 1)
        # last non-blank stdout line is each tool's own summary; a step that
        # reports on stderr (pytest collection errors, crashes before any
        # print) would otherwise leave an empty/misleading summary in the
        # artifact a verdict quotes (ADVICE r6) — fall back to stderr and
        # persist a stderr tail for failed steps
        ok = proc.returncode == 0
        last = next(
            (ln for ln in reversed(proc.stdout.splitlines()) if ln.strip()), ""
        )
        if not last:
            last = next(
                (ln for ln in reversed(proc.stderr.splitlines()) if ln.strip()), ""
            )
        results[name] = {"exit": proc.returncode, "sec": dur, "summary": last}
        if not ok:
            results[name]["stderr_tail"] = proc.stderr[-2000:]
        print(f"{'ok  ' if ok else 'FAIL'}  {name:14s} [{dur:7.1f}s]  {last}")
        if not ok:
            failed.append(name)
            # keep going: a round-close wants the FULL red list, not the first
    out = {
        "fast": fast,
        "failed": failed,
        "steps": results,
        "loadavg": list(os.getloadavg()),
    }
    diag = os.path.join(REPO, "DIAG")
    os.makedirs(diag, exist_ok=True)
    with open(os.path.join(diag, "roundclose_summary.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\n{'ALL GREEN' if not failed else 'RED: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
