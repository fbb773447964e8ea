"""Sinks — NEW surface (the reference only show()s, SURVEY.md §2.1 S3).

Partitioned parquet is the default lake layout: partition columns become
directories (static + dynamic partition pruning for every later reader);
bucketing co-locates join keys so repeated joins on the key skip their
shuffle entirely — the 100 TB answer to "we join on orderkey every day".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str] | None = None, mode: str = "overwrite"
) -> None:
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (requires a warehouse dir / catalog). Joins and
    aggregations on ``bucket_col`` between co-bucketed tables plan with NO
    exchange."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table, format="parquet")


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_training_shards(
    docs: DataFrame,
    path: str,
    split_col: str = "split",
    shard_col: str = "lang",
    order_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """The corpus-prep terminal sink: training shards partitioned by split
    (train/valid/test directories → downstream readers prune whole splits)
    and sorted by ``order_col`` within each file so sequence packing /
    resumable reads are deterministic.

    Layout contract at 100 TB: ``split`` is the partition directory (3
    values), ``shard_col`` keys the in-partition distribution (thousands of
    values → thousands of files per split), and rows within a file are
    ordered — repartition(shard) + sortWithinPartitions gives exactly one
    shuffle and a per-partition sort, never a global sort. The sort leads
    with the partition column: the dynamic-partition writer requires rows
    grouped by partition value and would otherwise insert its own
    (order-destroying) sort — leading with it makes the task ordering
    satisfy the writer's requirement, so the data order survives into files.
    """
    (
        docs.repartition(split_col, shard_col)
        .sortWithinPartitions(split_col, shard_col, order_col)
        .write.mode(mode)
        .partitionBy(split_col)
        .parquet(path)
    )


def write_orc(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """ORC sink — the columnar alternative where the downstream stack is
    Hive/Trino-flavored. Same partitioned-directory layout semantics as
    the parquet sink; Spark's native vectorized ORC reader keeps scans in
    whole-stage codegen just like parquet."""
    w = df.write.mode("overwrite").format("orc")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def upsert_parquet(
    spark: SparkSession, path: str, updates: DataFrame, key_cols: list[str]
) -> None:
    """MERGE-emulation for plain parquet: rows in ``updates`` replace
    current rows with the same key; unmatched keys append.

    Plan shape: ONE left-anti hash join (current ▷ updates on the key)
    + union — the minimal relational rendering of MERGE. The rewrite goes
    through a staging directory and a rename swap because parquet can't be
    overwritten while being read; the swap window is NOT transactional —
    concurrent readers need a table format with commit protocol (Delta/
    Iceberg/Hudi via sources/lakehouse.py when their jars are present).
    At scale, partition the table on a key prefix and rewrite only the
    partitions present in ``updates`` (dynamic partition overwrite), not
    the whole table.
    """
    current = spark.read.parquet(path)
    missing = [c for c in current.columns if c not in updates.columns]
    if missing:
        raise ValueError(f"updates lacks table columns: {missing}")
    keep = current.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
    merged = keep.unionByName(updates.select(*current.columns))
    _staged_replace(merged, path)


def overwrite_partitions_dynamic(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Incremental lake write: replace ONLY the partitions present in
    ``df``, leaving every other partition untouched (partitionOverwriteMode
    =dynamic, set per-write so the session default stays static). This is
    the daily-ingest idiom — reprocess day D, rewrite day D's directory,
    never touch history — and the partition-scoped alternative the
    ``upsert_parquet`` docstring points at."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def _staged_replace(df: DataFrame, path: str) -> None:
    """Write df to a staging dir, then swap it into place. NOT transactional
    during the swap window (see upsert_parquet's docstring)."""
    import os
    import shutil

    stage = path.rstrip("/") + "__stage"
    df.write.mode("overwrite").parquet(stage)
    old = path.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(stage, path)
    shutil.rmtree(old, ignore_errors=True)


def merge_aggregate_state(
    spark: SparkSession,
    state_path: str,
    delta: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
) -> None:
    """Incremental aggregate maintenance: fold a new batch into a persisted
    per-key aggregate table (SUM/COUNT state), so daily totals over a
    100 TB history cost one pass over the DELTA, never a recompute.

    Correctness rests on the merged aggregates being COMMUTATIVE MONOIDS:
    sums and counts merge associatively in any batch order (use exact
    cents ints for money — functions/exact.py); avg/stddev derive from
    (sum, count, sum-of-squares) at read time, never stored directly.
    Scale shape: the delta pre-aggregates before touching state (partial
    agg on the batch), then ONE key-partitioned merge agg over
    state ∪ delta; state stays key-partitioned parquet.
    """
    partial = delta.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias("n_rows"),
    )
    import os

    if os.path.exists(state_path):
        current = spark.read.parquet(state_path)
        merged = (
            current.unionByName(partial)
            .groupBy(*key_cols)
            .agg(
                *[F.sum(c).alias(c) for c in sum_cols],
                F.sum("n_rows").alias("n_rows"),
            )
        )
    else:
        merged = partial
    _staged_replace(merged, state_path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (optionally re-sorted for min/max pruning) and
    swap it into place. Returns the file count before compaction.

    The counterpart to every incremental writer in this module — streaming
    sinks, dynamic partition overwrite, and upserts all accrete small
    files, and scan cost at 100 TB is dominated by file-open overhead once
    files fall under ~100 MB. Run this as the periodic maintenance pass;
    with a sort_col it doubles as a clustering pass (use a z-order key —
    functions/vector.py::zorder_key2 — to cluster two dimensions at once).
    """
    import glob as _glob

    before = len(_glob.glob(path.rstrip("/") + "/part-*"))
    df = spark.read.parquet(path)
    if sort_col:
        out = df.repartitionByRange(target_files, sort_col).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.repartition(target_files)
    _staged_replace(out, path)
    return before
