"""Vector math over ``array<float>`` columns — JVM-side, no UDFs.

Used by similarity search / embedding dedup (BASELINE.json north star; the
reference's only vector ops are MLlib VectorAssembler/Normalizer call sites,
TfIdfCalculator.java:114-124). Implemented with ``zip_with`` + ``aggregate``
higher-order functions so they run inside codegen; elements are cast to
double *before* multiplication and folded strictly left-to-right, which makes
the result bitwise-reproducible by the DuckDB oracle builders below (same
operand order ⇒ same IEEE-754 result).

At 100 TB scale this is the right shape: a brute-force top-k is a single
scan + aggregate (no shuffle but the final top-k), and the bucketed-LSH
variant turns it into a bucket-equi-join that AQE can plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float-array columns, as double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


# --- DuckDB oracle builders (same accumulation order: list_sum is a
# sequential left-to-right fold over the list) ---------------------------------


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def l2_norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN {l2_norm_sql(a)} * {l2_norm_sql(b)} != 0 "
        f"THEN {dot_sql(a, b)} / ({l2_norm_sql(a)} * {l2_norm_sql(b)}) END"
    )


def zorder_key2(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative int columns, each
    truncated to ``bits`` bits — a space-filling-curve sort key. Sorting a
    table by this key before writing clusters BOTH dimensions into every
    file, so parquet min/max stats prune scans on either predicate (a 1-d
    sort can only prune its leading column). Pure shift/mask column
    algebra — codegen'd, no UDF.

    At 100 TB: range-partition by the z-key, sortWithinPartitions, write —
    each file covers a compact rectangle of (a, b) space.
    """
    az = a.cast("long")
    bz = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(az, i).bitwiseAND(F.lit(1)), 2 * i)
        bbit = F.shiftleft(F.shiftright(bz, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        key = key.bitwiseOR(abit).bitwiseOR(bbit)
    return key
