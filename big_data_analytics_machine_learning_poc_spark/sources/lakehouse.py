"""Lakehouse table-format connectors (Delta / Iceberg / Hudi).

The native paths need their runtime jars on the Spark classpath (not
present in this container; guide §'Sources & sinks': "stub connectors
behind an import-try"): availability is probed at call time. **Delta has a
jar-free fallback** — `sources/delta_lite.py` speaks the public Delta
transaction-log protocol directly (overwrite/append, partitioned tables,
time travel, log-level pruning), so ``read_table/write_table`` with
``fmt="delta"`` work HERE, routing through the jars when present and
delta_lite otherwise. Iceberg (avro manifests) and Hudi (timeline +
Hfile metadata) have no dependency-free metadata path in this container
and keep the loud, typed NotImplementedError.
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
        if fmt == "delta":
            from .delta_lite import read_delta

            return read_delta(spark, path)
        raise NotImplementedError(
            f"{fmt} runtime jars are not on the classpath; add the {fmt} Spark "
            f"package in the deployment (e.g. spark.jars.packages) to enable"
        )
    return spark.read.format(fmt).load(path)


def write_table(df: DataFrame, fmt: str, path: str, mode: str = "overwrite") -> None:
    if not format_available(df.sparkSession, fmt):
        if fmt == "delta":
            from .delta_lite import write_delta

            write_delta(df, path, mode=mode)
            return
        raise NotImplementedError(
            f"{fmt} runtime jars are not on the classpath; add the {fmt} Spark "
            f"package in the deployment (e.g. spark.jars.packages) to enable"
        )
    df.write.format(fmt).mode(mode).save(path)
