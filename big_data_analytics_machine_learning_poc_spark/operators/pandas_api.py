"""Pandas API on Spark (``pyspark.pandas``) lane.

A user of the reference switching to this engine may arrive with pandas
habits rather than DataFrame-API ones; ``df.pandas_api()`` gives them the
pandas surface with Spark's distributed execution underneath. One
registered query proves the lane end-to-end (the pandas ops translate to
the same Catalyst plans — groupby → hash aggregate, no driver
materialization until an explicit to_pandas).

Scale notes: pandas-on-Spark defaults are driver-safe here (no
``compute.ops_on_diff_frames``); avoid ``sort_index()`` on a huge frame
(global sort) and ``DataFrame.apply`` (row Python) — stay on groupby/agg
shapes, which compile to the exact plans the native API produces. The
exactness discipline carries over unchanged: aggregate cents (int64), not
dollars (double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import cents
from ..registry import QueryRegistry

REG = QueryRegistry()


@REG.add(
    "ps_segment_balance",
    sql="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_bal,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 100.0 AS avg_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def ps_segment_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment customer balance via the pandas API on Spark: Spark-side
    cents conversion, then pandas-style groupby/agg, then back to a native
    DataFrame for the exact-dollars projection. The groupby compiles to
    the same partial+final hash aggregate as the native API — the pandas
    surface costs nothing at this shape."""
    import warnings

    import pyspark.pandas as ps
    from pyspark.pandas.utils import PandasAPIOnSparkAdviceWarning

    # distributed default index: no global ordering pass, no single-partition
    # sequence — the only index type that scales.
    ps.set_option("compute.default_index_type", "distributed")
    # to_spark drops the frame's index — deliberate here (the grouping key
    # is a column after reset_index), so the advice warning is noise.
    warnings.filterwarnings("ignore", category=PandasAPIOnSparkAdviceWarning)

    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", cents("c_acctbal").alias("bal_cents")
    )
    psdf = cust.pandas_api()
    agg = (
        psdf.groupby("c_mktsegment")
        .agg(n_customers=("bal_cents", "count"), total_cents=("bal_cents", "sum"))
        .reset_index()
    )
    out = agg.to_spark()
    return out.select(
        "c_mktsegment",
        F.col("n_customers").cast("long").alias("n_customers"),
        (F.col("total_cents").cast("double") / 100.0).alias("total_bal"),
        (
            F.col("total_cents").cast("double")
            / F.col("n_customers")
            / 100.0
        ).alias("avg_bal"),
    ).orderBy("c_mktsegment")
