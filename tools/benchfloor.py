"""Bench-floor regression guard (VERDICT r5 ask #4).

``group_count`` is the acknowledged canary: its whole prepared-statement
cost (~19 ms at sf0.1) is Spark's per-query scheduling floor — a single
partial+final hash aggregate with nothing else in the plan. A scheduler
or session-profile regression that doubles that floor (AQE accidentally
on in the micro profile, shuffle partitions jumping, an extra job per
collect) would hide inside the 6-query bench TOTAL (0.12 s vs a 0.19 s
baseline leaves lots of slack) while silently taxing every query at
cluster scale. This guard pins each prepared per-query median to
2x its quiet-machine r5 value, so a floor regression fails a round gate
loudly instead of surfacing as a slow drift.

Runs ``bench.py`` itself (same measurement path — no drift between the
guard and the thing it guards) and parses its JSON line.

    python tools/benchfloor.py              # gate (exit 1 on breach)
    python tools/benchfloor.py --show       # print caps vs measured

Noise policy: bench.py already waits (bounded) for 1-min loadavg < 2 and
records ``loadavg_start``. If it still measured under load, the guard
SKIPS (exit 0 with a warning) — a loud co-tenant is not a plan
regression, and a gate that cries wolf gets deleted. Caps are 2x quiet
medians where run-to-run wobble on this shared VM is ~1.5x.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Quiet-machine r5 prepared medians (BENCH_r05.json, loadavg_start 1.89),
# seconds. Cap = 2x. Re-pin ONLY from a quiet run (loadavg_start < 2).
_QUIET_MEDIANS_S = {
    "agg_avg_max": 0.0227,
    "group_filter": 0.0197,
    "join3_agg": 0.0225,
    "describe": 0.0189,
    "corr": 0.0170,
    "group_count": 0.0191,
}
_CAP_FACTOR = 2.0
_QUIET_LOADAVG = 2.0


def main() -> int:
    show = "--show" in sys.argv[1:]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        check=False,
    )
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print(f"benchfloor: bench.py exited {proc.returncode}")
        return 1
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")), None
    )
    if line is None:
        print("benchfloor: no JSON line in bench.py output")
        return 1
    bench = json.loads(line)

    load = (bench.get("loadavg_start") or [None])[0]
    if load is None or load >= _QUIET_LOADAVG:
        print(
            f"benchfloor: SKIP — measured under 1-min loadavg {load} >= "
            f"{_QUIET_LOADAVG}; floor deltas are not attributable to plans"
        )
        return 0

    breaches = []
    for name, quiet in _QUIET_MEDIANS_S.items():
        measured = bench["queries"].get(name)
        cap = quiet * _CAP_FACTOR
        status = "OK" if (measured is not None and measured <= cap) else "BREACH"
        if show or status == "BREACH":
            print(
                f"{status:6} {name}: measured {measured * 1000:.1f} ms, "
                f"cap {cap * 1000:.1f} ms (quiet pin {quiet * 1000:.1f} ms)"
            )
        if status == "BREACH":
            breaches.append(name)
    if breaches:
        print(
            f"\nbenchfloor: {len(breaches)} lane(s) above 2x quiet floor at "
            f"loadavg {load} — scheduler/profile regression until proven "
            f"otherwise (total={bench['value']}s)"
        )
        return 1
    print(
        f"benchfloor: all {len(_QUIET_MEDIANS_S)} prepared medians within "
        f"2x quiet floor (loadavg_start {load}, total {bench['value']}s)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
