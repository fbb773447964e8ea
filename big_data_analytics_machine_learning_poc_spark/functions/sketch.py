"""Shared mergeable-sketch building blocks (see operators/sketches.py for
the lane-level rationale). ONE definition of the two-level bitmap
distinct-count shape, used by the batch lanes, the streaming lane, and the
tests alike — a change to the shape (bucket size, null handling, state
persistence) lands everywhere at once instead of drifting per copy."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def bitmap_level1(
    df: DataFrame,
    group_cols: list[ColumnOrName],
    id_col: str = "user_id",
    extra_aggs: tuple[Column, ...] = (),
) -> DataFrame:
    """Level 1 of the bitmap distinct count: group by ``group_cols`` plus the
    id's 32 768-wide bucket and fold bit positions into one RLE bitmap per
    (group, bucket) — the mergeable, ≤ 4 KiB partial-aggregation state that
    crosses the shuffle (and, persisted, folds across runs with
    ``bitmap_or_agg``). (bucket_number, bit_position) is a bijection of the
    id including zero/negative ids (pinned by
    tests/test_sketches.py::test_bitmap_bijective_over_zero_and_negative_ids).
    Works for streaming DataFrames too (state bounded by id-space ×
    open-window groups, never by row count)."""
    return df.groupBy(
        *group_cols, F.bitmap_bucket_number(id_col).alias("bkt")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(id_col)).alias("bm"),
        *extra_aggs,
    )


def fold_bitmap_counts(
    level1: DataFrame,
    group_cols: list[str],
    alias: str = "n_users",
    extra_aggs: tuple[Column, ...] = (),
) -> DataFrame:
    """Level 2: collapse per-bucket bitmaps to an exact distinct count per
    group (input is already one row per (group, bucket))."""
    return level1.groupBy(*group_cols).agg(
        F.sum(F.bitmap_count("bm")).alias(alias), *extra_aggs
    )


def bitmap_distinct_count(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "user_id",
    alias: str = "n_users",
) -> DataFrame:
    """Exact ``COUNT(DISTINCT id_col)`` per group without the expand-shuffle:
    the composed two-level bitmap aggregation."""
    return fold_bitmap_counts(
        bitmap_level1(df, list(group_cols), id_col), group_cols, alias
    )
