"""Schema-evolution audit lanes (r12): rename/drop/add column on BOTH
lakehouse engines under the oracle gate.

Doctrine as in ``lakehouse_ops.py``: each lane materializes a real table
in a tempdir, drives the public evolution + DML surface — including the
spicy paths (renaming an identity partition SOURCE on Iceberg; renames on
a column-mapped Delta table) — and reduces to aggregates the DuckDB
oracle re-derives from the source parquet alone. A hash match proves the
physical-name indirection (Iceberg: ``schema.name-mapping.default``
chains, iceberg_lite.py; Delta: columnMapping physical names,
delta_lite.py) loses and invents nothing across rename → append → UPDATE
→ DELETE → read, and that time travel still serves the pre-rename shape.
New module so the rotation ledger's closure digest leaves green
lakehouse_ops lanes alone (curation.py precedent).

Scale shape: metadata-only evolution (zero data I/O), DML as audited in
the dml/merge lanes; the final aggregate is a ≤5-group hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QueryRegistry

REG = QueryRegistry()

# both engines run the SAME logical script, so the lanes share one oracle:
# v1 = first third of customer as written; cur = both thirds after
# balance+1000 on custkey%7 rows, minus custkey%5 rows, with the
# post-evolution added column all-null (n_flag = 0)
_EVOLUTION_ORACLE = """
WITH v1 AS (
  SELECT 'v1' AS version_tag,
         c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(c_custkey) AS BIGINT) AS sum_custkey,
         CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS balance_cents,
         CAST(0 AS BIGINT) AS n_flag
  FROM customer WHERE c_custkey % 3 = 0
  GROUP BY c_mktsegment
), cur AS (
  SELECT 'cur' AS version_tag,
         c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(c_custkey) AS BIGINT) AS sum_custkey,
         CAST(SUM(CAST(ROUND(
           (c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 1000 ELSE 0 END)
           * 100) AS BIGINT)) AS BIGINT) AS balance_cents,
         CAST(0 AS BIGINT) AS n_flag
  FROM customer WHERE c_custkey % 3 <= 1 AND c_custkey % 5 <> 0
  GROUP BY c_mktsegment
)
SELECT * FROM v1
UNION ALL
SELECT * FROM cur
ORDER BY version_tag, segment
"""


def _thirds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )


def _evolved_agg(df: DataFrame, tag: str, seg: str, bal: str, flag) -> DataFrame:
    """Per-segment aggregate under whatever the frame's current column
    names are; ``flag`` is a Column for the added column's non-null count
    (lit(0) when the engine lane skips add-column)."""
    return (
        df.groupBy(F.col(seg).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("c_custkey").alias("sum_custkey"),
            F.sum(F.round(F.col(bal) * 100).cast("long")).alias("balance_cents"),
            flag.alias("n_flag"),
        )
        .select(
            F.lit(tag).alias("version_tag"),
            "segment",
            "n_rows",
            "sum_custkey",
            "balance_cents",
            "n_flag",
        )
    )


@REG.add("iceberg_evolution_audit", sql=_EVOLUTION_ORACLE)
def iceberg_evolution_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg rename/drop/add (r12, VERDICT r11 missing #1): write a
    third of customer partitioned by market segment, RENAME both a data
    column (c_acctbal → balance) and the identity partition SOURCE
    (c_mktsegment → segment — hive dirs must not move,
    iceberg_lite.py physical-name doctrine), append the second third
    under the new logical names, add a column (null-filled everywhere),
    then UPDATE and DELETE through the renamed schema. Current read
    aggregates under the new names; time travel to v1 reads the
    pre-rename shape. The oracle re-derives both from source parquet."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from ..sources.iceberg_lite import (
        add_column,
        delete_where,
        read_iceberg,
        rename_column,
        update_where,
        write_iceberg,
    )
    from ..streaming.events import spill_to_session_parquet

    cust = _thirds(spark, sf_dir)
    table = tempfile.mkdtemp(prefix="ice_evo_lane_")
    try:
        v1 = write_iceberg(
            cust.filter(F.col("c_custkey") % 3 == 0).repartition("c_mktsegment"),
            table,
            partition_cols=["c_mktsegment"],
        )
        rename_column(table, "c_acctbal", "balance")
        rename_column(table, "c_mktsegment", "segment")
        write_iceberg(
            cust.filter(F.col("c_custkey") % 3 == 1)
            .withColumnRenamed("c_acctbal", "balance")
            .withColumnRenamed("c_mktsegment", "segment"),
            table,
            mode="append",
        )
        add_column(table, "flag", T.LongType())
        update_where(
            spark, table, {"balance": "balance + 1000"}, "c_custkey % 7 = 0"
        )
        delete_where(spark, table, "c_custkey % 5 = 0")
        cur = _evolved_agg(
            read_iceberg(spark, table),
            "cur", "segment", "balance", F.count("flag"),
        )
        old = _evolved_agg(
            read_iceberg(spark, table, snapshot_id=v1),
            "v1", "c_mktsegment", "c_acctbal", F.lit(0).cast("long"),
        )
        out = old.unionByName(cur).orderBy("version_tag", "segment")
        return spill_to_session_parquet(out, "iceberg_evolution")
    finally:
        shutil.rmtree(table, ignore_errors=True)


@REG.add("delta_evolution_audit", sql=_EVOLUTION_ORACLE)
def delta_evolution_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME evolution script on the Delta engine (column mapping,
    delta_lite.py): enable columnMapping, rename the two columns, append
    under new names, UPDATE + DELETE through the renamed schema, read
    current + time travel to v1 — certified against the identical oracle
    as the Iceberg lane, so the two engines' rename semantics cannot
    drift apart unnoticed (no add-column here: Delta evolution goes
    through merge_schema writes, audited elsewhere; n_flag pins 0)."""
    import shutil
    import tempfile

    from ..sources.delta_lite import (
        delete_where,
        enable_column_mapping,
        read_delta,
        rename_column,
        update_where,
        write_delta,
    )
    from ..streaming.events import spill_to_session_parquet

    cust = _thirds(spark, sf_dir)
    table = tempfile.mkdtemp(prefix="dl_evo_lane_")
    shutil.rmtree(table)  # write_delta creates it
    try:
        v1 = write_delta(cust.filter(F.col("c_custkey") % 3 == 0), table)
        enable_column_mapping(table)
        rename_column(table, "c_acctbal", "balance")
        rename_column(table, "c_mktsegment", "segment")
        write_delta(
            cust.filter(F.col("c_custkey") % 3 == 1)
            .withColumnRenamed("c_acctbal", "balance")
            .withColumnRenamed("c_mktsegment", "segment"),
            table,
            mode="append",
        )
        update_where(
            spark, table, {"balance": "balance + 1000"}, "c_custkey % 7 = 0"
        )
        delete_where(spark, table, "c_custkey % 5 = 0")
        cur = _evolved_agg(
            read_delta(spark, table),
            "cur", "segment", "balance", F.lit(0).cast("long"),
        )
        old = _evolved_agg(
            read_delta(spark, table, version=v1),
            "v1", "c_mktsegment", "c_acctbal", F.lit(0).cast("long"),
        )
        out = old.unionByName(cur).orderBy("version_tag", "segment")
        return spill_to_session_parquet(out, "delta_evolution")
    finally:
        shutil.rmtree(table, ignore_errors=True)


_SPEC_EVOLUTION_ORACLE = """
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS sum_custkey,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS balance_cents
FROM customer
WHERE c_custkey % 3 <= 1 AND c_custkey % 5 <> 0
GROUP BY c_mktsegment
ORDER BY segment
"""


@REG.add("iceberg_spec_evolution_audit", sql=_SPEC_EVOLUTION_ORACLE)
def iceberg_spec_evolution_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution (r12, spec §Partition Evolution): load a
    third of customer UNPARTITIONED, ``evolve_partition_spec`` to a
    segment layout (metadata-only — zero data I/O; the lane RAISES if any
    data file changed), append the second third (lands under the NEW
    layout — raises unless the mixed plan shows both spec ids), DELETE
    through the mix, and aggregate the grouped mixed-layout read. The
    oracle re-derives the result from source parquet, so a hash match
    proves per-manifest pruning + the grouped union scan lose and invent
    nothing across the layout boundary — the 100 TB repartition story
    (metadata commit, not table rewrite), certified end to end."""
    import shutil
    import tempfile

    from ..sources.iceberg_lite import (
        delete_where,
        evolve_partition_spec,
        plan_scan,
        read_iceberg,
        write_iceberg,
    )
    from ..streaming.events import spill_to_session_parquet

    cust = _thirds(spark, sf_dir)
    table = tempfile.mkdtemp(prefix="ice_pspec_lane_")
    try:
        write_iceberg(cust.filter(F.col("c_custkey") % 3 == 0), table)
        files_before = sorted(plan_scan(table)["files"])
        evolve_partition_spec(table, ["c_mktsegment"])
        if sorted(plan_scan(table)["files"]) != files_before:
            raise RuntimeError(
                "evolve_partition_spec touched data files — must be "
                "metadata-only"
            )
        write_iceberg(
            cust.filter(F.col("c_custkey") % 3 == 1).repartition("c_mktsegment"),
            table,
            mode="append",
        )
        plan = plan_scan(table)
        if len(set(plan["file_specs"].values())) != 2:
            raise RuntimeError(
                f"expected a MIXED-layout snapshot, got specs "
                f"{set(plan['file_specs'].values())}"
            )
        delete_where(spark, table, "c_custkey % 5 = 0")
        out = (
            read_iceberg(spark, table)
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("c_custkey").alias("sum_custkey"),
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias(
                    "balance_cents"
                ),
            )
            .orderBy("segment")
        )
        return spill_to_session_parquet(out, "iceberg_spec_evolution")
    finally:
        shutil.rmtree(table, ignore_errors=True)
