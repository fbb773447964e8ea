"""JSONL (newline-delimited JSON) source/sink — the interchange format of
large text-corpus pipelines (no reference counterpart; the reference reads
only CSV, SURVEY.md §2.1. Extension surface alongside sources/csv.py).

Design for 100 TB:
- ALWAYS pass an explicit schema. Schema inference on JSON is a full extra
  scan AND type-unioning across billions of rows (a single float-looking
  string column flips the type) — unacceptable at scale.
- PERMISSIVE + corrupt-record column: web-scraped JSONL always contains
  truncated/malformed lines; quarantine them to a column instead of failing
  the job (FAILFAST) or silently dropping (DROPMALFORMED).
- Writes go through df.write.json with gzip codec by default — JSONL
  compresses ~10× and stays line-splittable per file for downstream
  consumers that stream it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """Single-pass explicit-schema JSONL read; malformed lines land in
    ``corrupt_col`` (whole raw line) with every schema column null."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if corrupt_col:
        if corrupt_col not in [f.name for f in schema.fields]:
            schema = StructType(
                list(schema.fields) + [StructField(corrupt_col, StringType())]
            )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).json(path)


def read_jsonl_strict(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """FAILFAST read for pipeline stages where malformed input means an
    upstream bug — fails the job on the first bad line instead of
    propagating nulls."""
    return spark.read.option("mode", "FAILFAST").schema(schema).json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    compression: str = "gzip",
    mode: str = "overwrite",
) -> None:
    """Partitioned JSONL sink. ``partition_by`` keys become directory
    levels (hive layout) so downstream readers get partition pruning even
    from a text format."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | None = None,
) -> DataFrame:
    """XML source (built into Spark 4 — no external package): one row per
    ``row_tag`` element. Same production stance as JSONL: pass an explicit
    schema (inference is an extra full parse of every file); PERMISSIVE is
    the default mode, so malformed elements null out instead of failing
    the job. XML shards split per-file, not per-block — keep files in the
    128-256 MB band at scale."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
