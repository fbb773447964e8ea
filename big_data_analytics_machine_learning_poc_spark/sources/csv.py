"""CSV sources (SURVEY.md §2.1 S1/S2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv_inferred(spark: SparkSession, path: str, encoding: str = "UTF-8") -> DataFrame:
    """S1: header + schema inference — reference parity
    (TfIdfCalculator.java:33-36 etc.). Inference costs an extra full scan:
    fine for POC-sized data, use read_csv_schema in production."""
    return (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .option("encoding", encoding)
        .csv(path)
    )


def read_csv_all_string(spark: SparkSession, path: str, encoding: str = "UTF-8") -> DataFrame:
    """S2: header only, every column string (SpamClassification.java:38-39;
    its spam.csv is latin-1 — pass encoding='ISO-8859-1' for such files)."""
    return (
        spark.read.format("csv")
        .option("header", "true")
        .option("encoding", encoding)
        .load(path)
    )


def read_csv_schema(
    spark: SparkSession,
    path: str,
    schema: StructType,
    encoding: str = "UTF-8",
    permissive_corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """Production read: explicit schema, single pass, PERMISSIVE mode with a
    corrupt-record column replacing the reference's cast-to-null idiom
    (SURVEY.md §1.3) — at 100 TB you want the bad rows quarantined, not
    silently dropped."""
    reader = (
        spark.read.option("header", "true")
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
    )
    if permissive_corrupt_col:
        if permissive_corrupt_col not in [f.name for f in schema.fields]:
            from pyspark.sql.types import StringType, StructField

            schema = StructType(list(schema.fields) + [StructField(permissive_corrupt_col, StringType())])
        reader = reader.option("columnNameOfCorruptRecord", permissive_corrupt_col)
    return reader.schema(schema).csv(path)
