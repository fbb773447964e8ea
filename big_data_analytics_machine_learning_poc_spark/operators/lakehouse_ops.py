"""Iceberg-lite lanes: the jar-free Iceberg v2 connector under the oracle
gate (write → manifest/metadata → snapshot read → partition pruning →
time travel, end-to-end in one driver-visible plan).

Same doctrine as the ``pyds_delta_scan`` / ``delta_dml_audit`` family in
``operators/quality.py``: the lane materializes a real lakehouse table in
a tempdir, drives the public read/write surface, and reduces to an
aggregate the DuckDB oracle re-derives from the source parquet alone — so
a hash match proves the whole metadata round trip (Avro manifests
included) loses and invents nothing. Lives in its own module so the
rotation ledger's closure digest doesn't re-flag the green quality.py
lanes (the curation.py precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QueryRegistry

REG = QueryRegistry()


@REG.add(
    "iceberg_scan_roundtrip",
    sql="""
    SELECT 'v1' AS version_tag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_custkey,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_custkey % 3 = 0
    UNION ALL
    SELECT 'v2',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(c_custkey) AS BIGINT),
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_custkey % 3 <= 1
    ORDER BY version_tag
    """,
)
def iceberg_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 via ``sources/iceberg_lite`` (VERDICT r8 ask #7): load a
    third of customer into an Iceberg table partitioned by market segment
    (snapshot v1), APPEND a second third (snapshot v2), then read BOTH
    snapshots back — v2 as the current table, v1 by snapshot-id time
    travel — each under a partition filter that the scan planner resolves
    against the Avro manifests' partition tuples and field summaries
    before any task is scheduled (tests/test_iceberg_lite.py asserts the
    4-of-5-segments file skip on this exact shape). The oracle re-derives
    both versions' aggregates from the source parquet, so a hash match
    proves: schema round trip through metadata.json, manifest entries
    gaining no/losing no files, append carrying the parent's manifests
    forward, snapshot isolation of the v1 read, and identity-partition
    values surviving the hive-dir → manifest → basePath rederivation.

    Scale shape: metadata I/O is O(manifests) on the driver, data I/O is
    the pruned file list — the same planning the Iceberg runtime does; no
    shuffle beyond the final ≤2-group aggregate."""
    import shutil
    import tempfile

    from ..sources.iceberg_lite import read_iceberg, write_iceberg
    from ..streaming.events import spill_to_session_parquet

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    table = tempfile.mkdtemp(prefix="ice_scan_")
    try:
        v1 = write_iceberg(
            cust.filter(F.col("c_custkey") % 3 == 0).repartition("c_mktsegment"),
            table,
            mode="overwrite",
            partition_cols=["c_mktsegment"],
        )
        write_iceberg(
            cust.filter(F.col("c_custkey") % 3 == 1).repartition("c_mktsegment"),
            table,
            mode="append",
        )

        def building_agg(df: DataFrame, tag: str) -> DataFrame:
            return df.agg(
                F.lit(tag).alias("version_tag"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("c_custkey").alias("sum_custkey"),
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias(
                    "acctbal_cents"
                ),
            ).select("version_tag", "n_rows", "sum_custkey", "acctbal_cents")

        travel = read_iceberg(
            spark, table, snapshot_id=v1,
            partition_filters={"c_mktsegment": "BUILDING"},
        )
        current = read_iceberg(
            spark, table, partition_filters={"c_mktsegment": "BUILDING"}
        )
        out = (
            building_agg(travel, "v1")
            .unionByName(building_agg(current, "v2"))
            .orderBy("version_tag")
        )
        # the table dies with the tempdir — spill the 2-row result to
        # session scope and hand back the lazy read
        return spill_to_session_parquet(out, "iceberg_scan")
    finally:
        shutil.rmtree(table, ignore_errors=True)
