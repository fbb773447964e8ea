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


def compare_query(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = exact match)."""
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
    if not problems and fingerprint(scols, srows) != fingerprint(dcols, drows):
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ms = sorted(tuple(norm_cell(r[i]) for i in order_s) for r in srows)
        md = sorted(tuple(norm_cell(r[i]) for i in order_d) for r in drows)
        diff = next((f"spark={a} oracle={b}" for a, b in zip(ms, md) if a != b), "")
        problems.append(f"value mismatch; first-diff {diff}")
    return problems
