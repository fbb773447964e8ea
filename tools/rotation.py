"""Driver-window rotation bookkeeping (VERDICT r4 ask #6).

With 195+ registered queries and a 50-row-per-round driver window, a full
re-confirm cycle spans 4+ rounds; hand-maintaining ``_DRIVER_WINDOW`` in
``__spark_entry__.py`` invites omissions. This tool mechanizes the
bookkeeping that previously lived as a prose snippet in COVERAGE.md:

1. loads the registry (every ``queries()`` name, in registration order),
2. scans ``CORRECTNESS_r*.json`` for each lane's LAST driver row and
   whether it was green (``hash_match``) or rows-only-green
   (``err == "no_oracle"`` with ``spark_rows > 0``),
3. hashes each lane's *current* definition (the query function's source +
   its oracle SQL) and diffs against a committed ledger of
   hash-at-last-green (``tools/rotation_ledger.json``),
4. emits the next window as a paste-ready Python tuple, staleness-ranked:

   - **never-checked** lanes first (no driver row in any round),
   - then **red-or-errored** lanes (last row not green — must re-observe),
   - then **changed-since-last-green** lanes (source/oracle hash differs
     from the ledger snapshot taken at their last green round),
   - then the **stalest greens** (oldest last-green round first) to fill
     the remaining slots.

Usage::

    python tools/rotation.py                  # print next-window tuple
    python tools/rotation.py --slots 50       # explicit window size
    python tools/rotation.py --update-ledger  # after a green round: record
                                              # current hashes for every
                                              # lane whose latest row is
                                              # green (ledger keeps the
                                              # round number + hash)
    python tools/rotation.py --check          # exit 1 if any lane has no
                                              # driver row and is absent
                                              # from _DRIVER_WINDOW (used
                                              # by tests/test_registry.py)

The ledger is committed so "changed-since-last-green" survives across
rounds/sessions; a lane absent from the ledger but holding a green row is
treated as changed (conservative: it gets re-confirmed once, then the
ledger pins it).
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LEDGER_PATH = os.path.join(REPO, "tools", "rotation_ledger.json")


def _registry():
    import __spark_entry__ as entry

    return entry._registry()


_PKG_PREFIX = "big_data_analytics_machine_learning_poc_spark"
_closure_cache: dict[str, str] = {}


def _module_closure_digest(mod_name: str | None) -> str:
    """Digest of the package files the lane's defining module imports at
    module level (one hop, intra-package, excluding the module's own file
    — the lane's own source is hashed separately at function granularity).
    This is what lets a HARNESS edit (streaming/events.py, catalog.py,
    functions/*) flag every dependent lane as changed-since-last-green,
    not just lanes whose own body was touched. Limitation (documented):
    imports made INSIDE function bodies are invisible here — keep shared
    helpers imported at module level in operator modules."""
    if not mod_name:
        return "nomod"
    if mod_name in _closure_cache:
        return _closure_cache[mod_name]
    import sys
    import types

    mod = sys.modules.get(mod_name)
    files: set[str] = set()
    own = getattr(mod, "__file__", None)
    for v in vars(mod).values() if mod else ():
        m = v if isinstance(v, types.ModuleType) else sys.modules.get(getattr(v, "__module__", "") or "")
        f = getattr(m, "__file__", None)
        if m and getattr(m, "__name__", "").startswith(_PKG_PREFIX) and f and f != own:
            files.add(f)
    h = hashlib.sha256()
    for f in sorted(files):
        try:
            h.update(re.sub(rb"\s+", b" ", open(f, "rb").read()))
        except OSError:
            h.update(f.encode())
        h.update(b"\x00")
    digest = h.hexdigest()[:16]
    _closure_cache[mod_name] = digest
    return digest


def lane_hash(fn, oracle: str | None) -> str:
    """Hash of the lane's current definition: the query function's source
    (falling back to module source for non-introspectable callables), the
    oracle SQL text, and the defining module's intra-package import
    closure (see _module_closure_digest). Whitespace-normalized so
    reformatting alone does not force a re-confirm."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = getattr(fn, "__module__", "") + getattr(fn, "__qualname__", repr(fn))
    norm = re.sub(r"\s+", " ", src).strip()
    onorm = re.sub(r"\s+", " ", oracle or "").strip()
    closure = _module_closure_digest(getattr(fn, "__module__", None))
    return hashlib.sha256(
        f"{norm}\n--oracle--\n{onorm}\n--deps--\n{closure}".encode()
    ).hexdigest()[:16]


def driver_history() -> dict[str, dict]:
    """lane -> {round, green} from the LATEST CORRECTNESS_r*.json row."""
    hist: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            green = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0
            )
            hist[name] = {"round": rnd, "green": green}
    return hist


def load_ledger() -> dict[str, dict]:
    try:
        return json.load(open(LEDGER_PATH))
    except (OSError, json.JSONDecodeError):
        return {}


def plan_window(slots: int = 50) -> dict:
    reg = _registry()
    hist = driver_history()
    ledger = load_ledger()

    never, red, changed, greens = [], [], [], []
    for name, fn in reg.queries.items():
        h = lane_hash(fn, reg.oracles.get(name))
        row = hist.get(name)
        if row is None:
            never.append(name)
        elif not row["green"]:
            red.append(name)
        elif ledger.get(name, {}).get("hash") != h:
            changed.append((row["round"], name))
        else:
            greens.append((row["round"], name))

    # changed: most-recently-green last (older green + changed = most urgent);
    # greens: stalest (oldest round) first
    changed.sort()
    greens.sort()
    ordered = never + red + [n for _, n in changed] + [n for _, n in greens]
    if len(never) + len(red) > slots:
        print(
            f"WARNING: {len(never)} never-checked + {len(red)} red lanes exceed "
            f"the {slots}-slot window — {len(never) + len(red) - slots} lane(s) "
            f"will get NO driver row this round; stop adding lanes or raise slots",
            file=sys.stderr,
        )
    return {
        "window": ordered[:slots],
        "never": never,
        "red": red,
        "changed": [n for _, n in changed],
        "stale_order": [n for _, n in greens],
        "total_registered": len(reg.queries),
    }


def update_ledger() -> int:
    """Pin CURRENT lane hashes — but only for lanes whose latest green row
    came from the most recent CORRECTNESS round. A green row at round N
    certifies the lane as of round N's final code; re-pinning an r1-green
    lane with today's hash would silently clear its changed-since-last-green
    flag even though the driver never saw the edited code (r6 fix: the
    previous unconditional re-pin did exactly that). Run this at ROUND START,
    before any edits, so "current hash" == "hash the just-finished driver
    round actually ran"."""
    reg = _registry()
    hist = driver_history()
    ledger = load_ledger()
    latest = max((row["round"] for row in hist.values()), default=0)
    n = 0
    for name, fn in reg.queries.items():
        row = hist.get(name)
        if row and row["green"] and row["round"] == latest:
            ledger[name] = {"hash": lane_hash(fn, reg.oracles.get(name)), "round": row["round"]}
            n += 1
    with open(LEDGER_PATH, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
    return n


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument("--update-ledger", action="store_true")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    if args.update_ledger:
        n = update_ledger()
        print(f"ledger updated: {n} green lanes pinned -> {LEDGER_PATH}")
        return 0

    plan = plan_window(args.slots)
    if args.check:
        import __spark_entry__ as entry

        missing = [n for n in plan["never"] if n not in entry._DRIVER_WINDOW]
        if missing:
            print(f"FAIL: lanes with no driver row absent from _DRIVER_WINDOW: {missing}")
            return 1
        print("OK: every never-checked lane is in _DRIVER_WINDOW")
        return 0

    print(
        f"# registry={plan['total_registered']}  never={len(plan['never'])}  "
        f"red={len(plan['red'])}  changed={len(plan['changed'])}  "
        f"green-stale-pool={len(plan['stale_order'])}"
    )
    print("_DRIVER_WINDOW = (")
    for name in plan["window"]:
        tag = (
            "never"
            if name in plan["never"]
            else "RED"
            if name in plan["red"]
            else "changed"
            if name in plan["changed"]
            else "re-confirm"
        )
        print(f'    "{name}",  # {tag}')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
