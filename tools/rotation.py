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
_closure_cache: dict[tuple[str, int], str] = {}


def _stripped_source(src: str) -> str | None:
    """Comment- and docstring-free canonical rendering (v3): parse →
    replace every docstring Expr with ``pass`` → ast.unparse (comments
    never survive parsing, so they vanish for free). Returns None when the
    text isn't standalone-parseable (caller falls back to the v1/v2
    whitespace normalization)."""
    import ast
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return None
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(body, list)
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            body[0] = ast.Pass()
    return ast.unparse(tree)


def _norm_src(src: str, version: int) -> str:
    """Version-correct source normalization. v1/v2: whitespace-collapsed
    raw text (reformatting-insensitive, but a docstring or comment edit
    still changes the hash). v3: AST-rendered with docstrings/comments
    stripped — a pure-documentation edit no longer dep-flags a lane (the
    r6 ADVICE/VERDICT doc-only fixes to exact.py/graph.py re-flagged ~24
    already-green lanes whose behavior was untouched; that churn is what
    v3 removes). Behavior edits still flag: the AST rendering preserves
    every executable token."""
    if version >= 3:
        s = _stripped_source(src)
        if s is not None:
            return s
    return re.sub(r"\s+", " ", src).strip()


def _norm_file_bytes(raw: bytes, version: int) -> bytes:
    if version >= 3:
        try:
            s = _stripped_source(raw.decode("utf-8"))
        except UnicodeDecodeError:
            s = None
        if s is not None:
            return s.encode("utf-8")
    return re.sub(rb"\s+", b" ", raw)


def _module_closure_digest(mod_name: str | None, version: int) -> str:
    """Digest of the package files the lane's defining module imports at
    module level (one hop, intra-package, excluding the module's own file
    — the lane's own source is hashed separately at function granularity).
    This is what lets a HARNESS edit (streaming/events.py, catalog.py,
    functions/*) flag every dependent lane as changed-since-last-green,
    not just lanes whose own body was touched. Imports made INSIDE
    function bodies are invisible here — covered since v2 by
    _body_import_digest; same-module helper references by
    _local_refs_digest."""
    if not mod_name:
        return "nomod"
    key = (mod_name, version)
    if key in _closure_cache:
        return _closure_cache[key]
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
            h.update(_norm_file_bytes(open(f, "rb").read(), version))
        except OSError:
            h.update(f.encode())
        h.update(b"\x00")
    digest = h.hexdigest()[:16]
    _closure_cache[key] = digest
    return digest


# Ledger hash-formula version. v1: function source + oracle + module-level
# import closure. v2 (r6) closes v1's two documented blind spots:
# (a) files named by RELATIVE IMPORTS INSIDE the function body — 42
#     operator-lane bodies do `from ..sources.delta_lite import ...`-style
#     local imports, so an edit to delta_lite.py never dep-flagged those
#     lanes unless their MODULE also imported it at top level;
# (b) SAME-MODULE helpers — the closure digest excludes the defining
#     module's own file (the lane's source is hashed at function
#     granularity), so an edit to a helper like similarity.pq_encode never
#     flagged the lanes calling it. v2 hashes the transitive same-module
#     function references (via co_names) plus referenced module constants.
# v3 (r6) makes every hashed source COMMENT- AND DOCSTRING-INSENSITIVE
# (_norm_src/_norm_file_bytes): v2's whitespace collapse still flagged a
# lane when only documentation changed — the r6 ADVICE doc-only edits to
# exact.py/graph.py re-flagged ~24 green lanes with untouched behavior,
# inflating the re-confirm backlog the window budget has to drain.
# Entries record their version; plan_window compares each pin under the
# formula it was written with, so bumping the formula does not spuriously
# flag every lane — lanes migrate to the current formula as they
# re-confirm. (No bulk migration on purpose: re-stamping an OLD v1 pin at
# v2+ would certify body-import dependency states the driver never re-saw.)
LEDGER_VERSION = 3

_BODY_IMPORT_RE = re.compile(
    # names: either a same-line list, or a parenthesized (possibly
    # multiline) list — DOTALL-free by matching non-')' inside the parens
    r"(?m)^\s*from\s+(\.+)([\w.]*)\s+import\s+(?:\(([^)]*)\)|([\w, ]+))"
)


def _body_import_files(fn) -> set[str]:
    """Package files referenced by relative imports INSIDE the function's
    own source, resolved textually against the defining module's package
    (the modules need not be imported yet — lanes do these imports lazily
    at call time)."""
    mod_name = getattr(fn, "__module__", "") or ""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return set()
    pkg_parts = mod_name.split(".")[:-1]
    files: set[str] = set()
    for m in _BODY_IMPORT_RE.finditer(src):
        dots, rel = m.group(1), m.group(2)
        names = m.group(3) or m.group(4) or ""
        up = len(dots) - 1
        if up > len(pkg_parts):
            continue
        base = pkg_parts[: len(pkg_parts) - up] if up else list(pkg_parts)
        target = base + [p for p in rel.split(".") if p]
        root = os.path.join(REPO, *target)
        if os.path.isfile(root + ".py"):
            files.add(root + ".py")
        elif os.path.isdir(root):
            init = os.path.join(root, "__init__.py")
            if os.path.isfile(init):
                files.add(init)
            # `from ..pkg import submodule` — include named submodules too
            for nm in names.split(","):
                f = os.path.join(root, nm.strip() + ".py")
                if os.path.isfile(f):
                    files.add(f)
    return files


def _const_repr(v, version: int) -> str:
    """repr for module-constant payload entries. From v3, frozensets (and
    frozensets nested in tuples) render in sorted order: native set repr
    follows hash-iteration order, which varies with PYTHONHASHSEED — the
    driver pins it to 0 but local tool runs don't, so an unsorted repr
    would make a lane's pin process-dependent. v1/v2 keep the raw repr
    their existing pins were written with."""
    if version >= 3:
        if isinstance(v, frozenset):
            # recurse BEFORE sorting so nested containers (frozenset-of-
            # frozenset, tuple-below-frozenset) also render seed-independently
            # (ADVICE r6: raw repr of elements reintroduced the
            # PYTHONHASHSEED dependence for nested shapes — latent today,
            # pinned closed here)
            return "frozenset([" + ", ".join(sorted(_const_repr(x, version) for x in v)) + "])"
        if isinstance(v, tuple):
            return "(" + ", ".join(_const_repr(x, version) for x in v) + ",)"
    return repr(v)


def _local_refs_digest(fn, version: int) -> str:
    """Digest of the SAME-MODULE functions ``fn`` references, transitively
    (helper → helper), plus referenced module-level simple constants —
    the v2 fix for blind spot (b): an edit to a module-local helper now
    changes every calling lane's hash without flagging the module's
    unrelated lanes. References are taken from co_names (including nested
    code objects, so lambdas/inner defs count)."""
    import sys
    import types

    mod = sys.modules.get(getattr(fn, "__module__", "") or "")
    if mod is None:
        return "nomod"
    payload: list[str] = []
    seen: set[str] = set()
    visited_fns: set[int] = {id(fn)}
    stack = [fn]
    while stack:
        f = stack.pop()
        code = getattr(f, "__code__", None)
        if code is None:
            continue
        names = set(code.co_names)
        consts = list(code.co_consts)
        while consts:
            c = consts.pop()
            if isinstance(c, types.CodeType):
                names |= set(c.co_names)
                consts.extend(c.co_consts)
        for nm in names:
            if nm in seen or nm.startswith("__"):
                continue
            seen.add(nm)
            v = getattr(mod, nm, None)
            if (
                isinstance(v, types.FunctionType)
                and getattr(v, "__module__", None) == fn.__module__
                and id(v) not in visited_fns
            ):
                visited_fns.add(id(v))
                try:
                    payload.append(_norm_src(inspect.getsource(v), version))
                except (OSError, TypeError):
                    payload.append(nm)
                stack.append(v)
            elif isinstance(v, (int, float, str, bytes, tuple, frozenset)):
                payload.append(f"{nm}={_const_repr(v, version)}")
    if not payload:
        return "norefs"
    h = hashlib.sha256()
    for p in sorted(payload):
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _body_import_digest(fn, version: int) -> str:
    files = _body_import_files(fn)
    if not files:
        return "nobody"
    h = hashlib.sha256()
    for f in sorted(files):
        try:
            h.update(_norm_file_bytes(open(f, "rb").read(), version))
        except OSError:
            h.update(f.encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def lane_hash(fn, oracle: str | None, version: int = LEDGER_VERSION) -> str:
    """Hash of the lane's current definition: the query function's source
    (falling back to module source for non-introspectable callables), the
    oracle SQL text, the defining module's intra-package import closure
    (see _module_closure_digest), and — from v2 — the files its body-level
    relative imports name. v1/v2 are whitespace-normalized (reformatting
    alone never forces a re-confirm); v3 additionally strips comments and
    docstrings everywhere (_norm_src), so documentation edits don't
    either."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = getattr(fn, "__module__", "") + getattr(fn, "__qualname__", repr(fn))
    norm = _norm_src(src, version)
    onorm = re.sub(r"\s+", " ", oracle or "").strip()
    closure = _module_closure_digest(getattr(fn, "__module__", None), version)
    payload = f"{norm}\n--oracle--\n{onorm}\n--deps--\n{closure}"
    if version >= 2:
        payload += (
            f"\n--bodydeps--\n{_body_import_digest(fn, version)}"
            f"\n--localrefs--\n{_local_refs_digest(fn, version)}"
        )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


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
        row = hist.get(name)
        entry = ledger.get(name, {})
        # compare each pin under the formula version it was written with
        # (absent version = v1) so a formula bump alone flags nothing
        h = lane_hash(fn, reg.oracles.get(name), entry.get("v", 1))
        # v3 hashes render through ast.unparse, whose exact output can
        # change across Python MINOR versions (ADVICE r6): a pin written
        # under a different interpreter is not comparable — conservatively
        # re-confirm rather than either spurious state. Pins without a
        # recorded "py" predate this field and compare as before (same
        # container, same interpreter, in practice).
        pin_py = entry.get("py")
        py_now = ".".join(map(str, sys.version_info[:2]))
        if row is None:
            never.append(name)
        elif not row["green"]:
            red.append(name)
        elif entry.get("hash") != h or (pin_py is not None and pin_py != py_now):
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
            ledger[name] = {
                "hash": lane_hash(fn, reg.oracles.get(name)),
                "round": row["round"],
                "v": LEDGER_VERSION,
                # ast.unparse rendering (v3 normal form) is only guaranteed
                # stable within one Python minor version — record it so
                # plan_window can force a re-confirm across interpreter bumps
                "py": ".".join(map(str, sys.version_info[:2])),
            }
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
