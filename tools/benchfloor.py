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

# Quiet-machine prepared medians, seconds. Cap = 2x. Re-pin ONLY from a
# quiet run (loadavg_start < 2).
#
# r10 re-pin (was the r5 BENCH_r05 set, 17.0-22.7 ms): the per-query
# scheduling floor drifted up ~10 ms UNIFORMLY across all six lanes over
# five rounds (isolated quiet-box medians r10: agg_avg_max ~35 ms,
# group_count ~32 ms at loadavg 0.1) while every plan gate stayed flat —
# shuffle budget 0 grew, plan lint clean, perfsweep 259 ok at 3x — so
# this is shared-VM environment drift, not a plan regression; the stale
# r5 pins had agg_avg_max brushing its 2x cap on every quiet run (the
# two round-10 battery reds). Pins below are the per-lane MEDIAN OF
# THREE quiet r10 bench runs (loadavg_start 0.68 / 0.01 / 0.12).
_QUIET_MEDIANS_S = {
    "agg_avg_max": 0.0372,
    "group_filter": 0.0288,
    "join3_agg": 0.0328,
    "describe": 0.0235,
    "corr": 0.0241,
    "group_count": 0.0262,
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
