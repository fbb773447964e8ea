"""DuckDB differential-oracle utilities (SURVEY.md §5 strategy #1).

Mirrors the driver's gate: run the Spark query and the oracle SQL over the
same parquet, compare row count + column names + an order-insensitive value
fingerprint. Used by tools/compare.py and the pytest suite so every operator
is differential-tested locally before the driver ever sees it.
"""

from __future__ import annotations

import datetime
import hashlib
import math

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def norm_cell(v) -> str:
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def fingerprint(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def compare_query(spark_df, con, sql: str, sidecar: str | None = None) -> list[str]:
    """Return a list of mismatch descriptions (empty = exact match).

    ``sidecar``: optional query name; when set, both sides' fingerprints —
    and on mismatch the first differing normalized rows — are dumped to
    ``DIAG/compare_<name>.json`` next to the repo root, so a red row is
    diagnosable after the fact (round-2 ask: driver-side reds left nothing
    to inspect)."""
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    problems: list[str] = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(dcols)}")
    first_diffs: list[tuple[str, str]] = []
    if not problems and fingerprint(scols, srows) != fingerprint(dcols, drows):
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ms = sorted(tuple(norm_cell(r[i]) for i in order_s) for r in srows)
        md = sorted(tuple(norm_cell(r[i]) for i in order_d) for r in drows)
        first_diffs = [(str(a), str(b)) for a, b in zip(ms, md) if a != b][:10]
        diff = f"spark={first_diffs[0][0]} oracle={first_diffs[0][1]}" if first_diffs else ""
        problems.append(f"value mismatch; first-diff {diff}")
    if sidecar is not None:
        _dump_compare_sidecar(sidecar, scols, srows, dcols, drows, problems, first_diffs)
    return problems


def _dump_compare_sidecar(
    name: str, scols, srows, dcols, drows, problems, first_diffs
) -> None:
    import json
    import os

    diag = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "DIAG")
    try:
        os.makedirs(diag, exist_ok=True)
        with open(os.path.join(diag, f"compare_{name}.json"), "w") as f:
            json.dump(
                {
                    "query": name,
                    "spark_rows": len(srows),
                    "oracle_rows": len(drows),
                    "spark_fingerprint": fingerprint(scols, srows),
                    "oracle_fingerprint": fingerprint(dcols, drows),
                    "problems": problems,
                    "first_diffs": first_diffs,
                },
                f,
                indent=1,
            )
    except OSError:
        pass  # diagnostics must never fail the comparison
