"""As-of (temporal point-in-time) join — an operator Spark lacks natively
(SURVEY.md §2.11 NEW; guide pattern: bucketize or merge_asof).

Implemented the scale-right way: **union + ordered window**, not a range
cross-join and not per-group pandas. Tag both sides, union, then one window
per key ordered by event time where ``last(value, ignoreNulls=True)``
carries the most recent right-side observation forward onto left rows.
Cost: a single hash shuffle on the key + an in-partition sort — linear at
100 TB, skew handled by AQE like any other shuffle.

Oracle: DuckDB's native ``ASOF LEFT JOIN``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import QueryRegistry

REG = QueryRegistry()


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_value: str,
    value_alias: str = "asof_value",
) -> DataFrame:
    """For every left row, attach the latest ``right_value`` from the right
    side with ``right.ts <= left.ts`` and equal ``on`` key (backward as-of,
    inclusive). Left rows with no prior right row get null."""
    lcols = left.columns
    rv_type = right.schema[right_value].dataType
    l = left.select(
        *lcols, F.lit(1).alias("_side"), F.lit(None).cast(rv_type).alias("_rv")
    )
    r = right.select(
        F.col(on),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (on, ts)],
        F.lit(0).alias("_side"),
        F.col(right_value).alias("_rv"),
    )
    unioned = l.unionByName(r)
    # order: ts asc, right rows before left rows at equal ts (inclusive <=)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(value_alias, F.last("_rv", ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).select(*lcols, value_alias)


@REG.add(
    "asof_purchase_last_click",
    sql="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id < 100
    ), clicks AS (
      SELECT user_id, ts, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS click_epoch
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, c.click_epoch AS last_click_epoch
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the epoch of the user's most recent click at or
    before the purchase (attribution-style point-in-time lookup)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 100)).select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.floor(F.col("ts").cast("double")).cast("bigint").alias("click_epoch")
    )
    return asof_join(
        purchases, clicks, on="user_id", ts="ts", right_value="click_epoch",
        value_alias="last_click_epoch",
    ).select("event_id", "user_id", "last_click_epoch")
