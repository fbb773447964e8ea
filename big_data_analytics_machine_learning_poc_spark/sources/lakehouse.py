"""Lakehouse table-format connectors (Delta / Iceberg / Hudi) — stubbed.

The formats need their runtime jars on the Spark classpath (not present in
this container; guide §'Sources & sinks': "stub connectors behind an
import-try"). The functions below detect availability at call time and
raise a clear NotImplementedError otherwise, so a deployment with the jars
gets working readers/writers and this environment gets a loud, typed error
instead of a Py4J stack trace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {
    "delta": "io.delta.sql.DeltaSparkSessionExtension",
    "iceberg": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "hudi": "org.apache.spark.sql.hudi.HoodieSparkSessionExtension",
}


def format_available(spark: SparkSession, fmt: str) -> bool:
    """True if the format's extension classes are on the JVM classpath."""
    if fmt not in _FORMATS:
        raise KeyError(f"unknown lakehouse format {fmt!r}; known: {sorted(_FORMATS)}")
    try:
        spark._jvm.java.lang.Class.forName(_FORMATS[fmt])
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    if not format_available(spark, fmt):
        raise NotImplementedError(
            f"{fmt} runtime jars are not on the classpath; add the {fmt} Spark "
            f"package in the deployment (e.g. spark.jars.packages) to enable"
        )
    return spark.read.format(fmt).load(path)


def write_table(df: DataFrame, fmt: str, path: str, mode: str = "overwrite") -> None:
    if not format_available(df.sparkSession, fmt):
        raise NotImplementedError(
            f"{fmt} runtime jars are not on the classpath; add the {fmt} Spark "
            f"package in the deployment (e.g. spark.jars.packages) to enable"
        )
    df.write.format(fmt).mode(mode).save(path)
