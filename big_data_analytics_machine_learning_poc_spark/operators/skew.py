"""Skew-mitigation recipes (SURVEY.md §7 M5; BASELINE.json 100 TB mandate).

Two layers of defense for hot keys:

1. AQE skew-join splitting — on by default in the session factory
   (``spark.sql.adaptive.skewJoin.enabled``): oversized shuffle partitions
   are split at runtime. Zero code.
2. **Salted two-phase aggregation** (here): when one group key holds a large
   share of all rows (events.event_type: 5 keys over everything), a plain
   groupBy sends each hot key to ONE reducer. Salting splits each key into
   ``n_salts`` deterministic sub-keys, aggregates partials in parallel, then
   combines the tiny partial set. The result is *identical* to the plain
   aggregation — which is exactly what the DuckDB oracle checks.

The salt must be deterministic (derived from a row attribute, not rand()) so
reruns and retried tasks agree — nondeterministic salts break speculative
execution and, here, the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import cents
from ..registry import QueryRegistry

REG = QueryRegistry()


def salted_sum(
    df: DataFrame, key: str, value: Column, value_alias: str, salt_from: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase skew-safe sum: groupBy(key, salt) → groupBy(key).

    Phase 1 spreads each hot key over ``n_salts`` reducers; phase 2 combines
    ``n_keys × n_salts`` partials — trivially small. Requires an associative
    aggregate (sum/count/min/max); value should be exact-typed (cents/long)
    so the regroup cannot change the result.
    """
    salted = df.withColumn("_salt", F.pmod(F.col(salt_from), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_pv"), F.count(F.lit(1)).alias("_pn")
    )
    return partial.groupBy(key).agg(
        F.sum("_pv").alias(value_alias), F.sum("_pn").alias("n")
    )


@REG.add(
    "skew_salted_agg",
    sql="""
    SELECT event_type,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe sum of value per event_type (5 hot keys ← every row).
    The oracle is the PLAIN aggregation: salting must be invisible in the
    result."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_sum(
        ev, key="event_type", value=cents("value"), value_alias="cents_total",
        salt_from="event_id", n_salts=16,
    )
    return out.select(
        "event_type",
        (F.col("cents_total") / F.lit(100.0)).alias("total_value"),
        "n",
    ).orderBy("event_type")


@REG.add(
    "skew_salted_join",
    sql="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             CAST(CASE event_type WHEN 'purchase' THEN 10.0 WHEN 'signup' THEN 5.0
                                  WHEN 'click' THEN 0.1 WHEN 'view' THEN 0.05
                                  ELSE 1.0 END AS DOUBLE) AS weight
      FROM events
    )
    SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(d.weight), 6) AS total_weight
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join against a hot-key dimension: fact side salts
    the join key, dim side is exploded ×n_salts so every (key, salt) bucket
    finds its row — same rows as the plain join (which the oracle runs).
    At 100 TB this is the fallback when the dim is too big to broadcast but
    the fact key is pathologically hot."""
    n_salts = 8
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type").distinct()
        .withColumn(
            "weight",
            F.when(F.col("event_type") == "purchase", 10.0)
            .when(F.col("event_type") == "signup", 5.0)
            .when(F.col("event_type") == "click", 0.1)
            .when(F.col("event_type") == "view", 0.05)
            .otherwise(1.0),
        )
    )
    dim_rep = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    fact = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(n_salts)))
    joined = fact.join(dim_rep, ["event_type", "_salt"])
    return (
        joined.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("weight"), 6).alias("total_weight"))
        .orderBy("event_type")
    )
