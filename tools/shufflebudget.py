"""Full-registry shuffle-budget sweep (see big_data_analytics_machine_learning_poc_spark/plans/budget.py).

    python tools/shufflebudget.py [sf_dir]                    # compare vs ledger
    python tools/shufflebudget.py [sf_dir] --baseline         # (re)write ledger
    python tools/shufflebudget.py [sf_dir] lane [lane ...]    # subset compare

Constructs every registered query at ``sf_dir`` (default sf0.01 — the
same pin as the lint sweep; see budget.py's stats caveat), counts its
Exchange nodes by cost class, and compares the SHUFFLE count against the
committed ledger ``tools/shuffle_budget.json``:

- lane's shuffle count GREW  -> FAIL (a new shuffle slipped into the plan)
- shrank                     -> note it (improvement: run --baseline to ratchet)
- lane not in ledger         -> note it (new lane: run --baseline)

Broadcast/reused counts are recorded in the ledger for plan-shape
diffing but never gated. Exit 1 on any growth or construction error.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEDGER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shuffle_budget.json")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--baseline"]
    baseline = "--baseline" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from big_data_analytics_machine_learning_poc_spark.plans.budget import exchange_counts
    from big_data_analytics_machine_learning_poc_spark.session import get_session

    prior: dict[str, dict[str, int]] = {}
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            prior = json.load(f)["lanes"]

    spark = get_session("shufflebudget", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    lanes: dict[str, dict[str, int]] = {}
    n_ok = n_grew = n_shrank = n_new = n_err = 0
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            counts = exchange_counts(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"ERR    {name}: {type(e).__name__}: {str(e)[:150]}")
            n_err += 1
            continue
        lanes[name] = counts
        if name not in prior:
            print(f"NEW    {name}: {counts}")
            n_new += 1
        elif counts["shuffle"] > prior[name]["shuffle"]:
            print(f"GREW   {name}: shuffle {prior[name]['shuffle']} -> {counts['shuffle']}")
            n_grew += 1
        elif counts["shuffle"] < prior[name]["shuffle"]:
            print(f"shrank {name}: shuffle {prior[name]['shuffle']} -> {counts['shuffle']}")
            n_shrank += 1
        else:
            n_ok += 1
    spark.stop()

    if baseline:
        merged = dict(prior) if only else {}
        merged.update(lanes)
        with open(LEDGER, "w") as f:
            json.dump({"sf_dir": sf_dir, "lanes": dict(sorted(merged.items()))}, f, indent=1)
        print(f"\nledger written: {len(merged)} lanes -> {LEDGER}")
        return 1 if n_err else 0

    print(f"\n{n_ok} ok, {n_grew} grew, {n_shrank} shrank, {n_new} new, {n_err} errors")
    return 1 if n_grew or n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
