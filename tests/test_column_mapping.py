"""Column mapping — metadata-only RENAME / DROP / ADD COLUMN
(sources/delta_lite.py).

Contracts under test: renames and drops commit ONLY metadata (no data file
touched); physical names stay stable so stats/Bloom skipping keep working
across renames; a re-added column can never alias a dropped column's
leftover bytes (fresh physical name); every reader — read_delta, the
connector, DELETE/MERGE/OPTIMIZE rewrite cores — translates physical <->
logical correctly; time travel sees each version under its own schema.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
    _replay,
    _table_protocol,
    add_column,
    compact_table,
    delete_where,
    drop_column,
    enable_column_mapping,
    merge_delta,
    read_delta,
    rename_column,
    snapshot_diff,
    write_delta,
)


def _make(spark, tmp_path, name="t"):
    table = str(tmp_path / name)
    df = spark.range(50).select(
        F.col("id").cast("long"),
        (F.col("id") % 5).cast("long").alias("grp"),
        F.format_string("u_%03d", F.col("id")).alias("name"),
    )
    write_delta(df.repartition(2), table)
    return table


def test_enable_requires_unpartitioned(spark, tmp_path):
    table = str(tmp_path / "p")
    df = spark.range(10).select("id", (F.col("id") % 2).alias("p"))
    write_delta(df, table, partition_cols=["p"])
    with pytest.raises(NotImplementedError, match="partitioned"):
        enable_column_mapping(table)


def test_rename_is_metadata_only_and_time_travel_sees_old_name(spark, tmp_path):
    table = _make(spark, tmp_path)
    before = {p: a["size"] for p, a in _replay(table, None)[0].items()}
    enable_column_mapping(table)
    rename_column(table, "name", "username")
    after = {p: a["size"] for p, a in _replay(table, None)[0].items()}
    assert after == before  # zero data rewritten
    out = read_delta(spark, table)
    assert "username" in out.columns and "name" not in out.columns
    assert out.filter(F.col("username") == "u_007").count() == 1
    # the pre-rename snapshot still reads under its own schema
    v0 = read_delta(spark, table, version=0)
    assert "name" in v0.columns and "username" not in v0.columns
    # protocol carries the mapping feature — and gates FOREIGN WRITERS too:
    # the spec puts column mapping at legacy writer version 5, so a
    # spec-compliant external writer on wv ≤4 (which would write physical
    # names unmapped and corrupt the table) must see itself refused
    proto = _table_protocol(table)["protocol"]
    assert proto["minReaderVersion"] == 2
    assert proto["minWriterVersion"] == 5
    assert "columnMapping" in proto["readerFeatures"]


def test_append_after_rename_writes_physical_names(spark, tmp_path):
    import pyarrow.parquet as pq

    table = _make(spark, tmp_path)
    enable_column_mapping(table)
    rename_column(table, "name", "username")
    extra = spark.createDataFrame([(900, 0, "u_900")], "id long, grp long, username string")
    write_delta(extra, table, mode="append")
    out = read_delta(spark, table)
    assert out.count() == 51
    assert out.filter(F.col("username") == "u_900").count() == 1
    # the NEW file stores the stable PHYSICAL name ("name"), not the logical
    active, _, _ = _replay(table, None)
    newest = max(active.values(), key=lambda a: a["modificationTime"])
    footer_cols = pq.ParquetFile(os.path.join(table, newest["path"])).schema_arrow.names
    assert "name" in footer_cols and "username" not in footer_cols


def test_drop_then_readd_cannot_alias_old_bytes(spark, tmp_path):
    table = _make(spark, tmp_path)
    enable_column_mapping(table)
    drop_column(table, "name")
    assert "name" not in read_delta(spark, table).columns
    add_column(table, "name", LongType())
    out = read_delta(spark, table)
    # the re-added column reads NULL everywhere — never the dropped strings
    assert out.filter(F.col("name").isNotNull()).count() == 0
    assert out.count() == 50


def test_skipping_survives_rename(spark, tmp_path):
    table = str(tmp_path / "skip")
    df = spark.range(100).select(
        F.col("id").cast("long"),
        F.format_string("u_%03d", F.col("id")).alias("name"),
    )
    write_delta(df.repartitionByRange(4, "id"), table, bloom_columns=["name"])
    enable_column_mapping(table)
    rename_column(table, "name", "username")
    rename_column(table, "id", "uid")
    # zone-map pruning keyed by the renamed logical -> old physical stats
    out = read_delta(spark, table, range_filters={"uid": (10, 12)})
    assert out.filter(F.col("uid").between(10, 12)).count() == 3
    # bloom pruning under the new logical name: absent value -> empty scan
    absent = read_delta(spark, table, equality_filters={"username": "u_999"})
    assert absent.count() == 0


def test_connector_reads_and_prunes_mapped_table(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo

    from big_data_analytics_machine_learning_poc_spark.sources.pyds import (
        DeltaLiteDataSource,
    )

    table = str(tmp_path / "conn")
    df = spark.range(100).select(
        F.col("id").cast("long"),
        F.format_string("u_%03d", F.col("id")).alias("name"),
    )
    write_delta(df.repartitionByRange(4, "id"), table, bloom_columns=["name"])
    enable_column_mapping(table)
    rename_column(table, "name", "username")
    spark.dataSource.register(DeltaLiteDataSource)
    got = spark.read.format("delta_lite").load(table)
    assert got.columns == ["id", "username"]
    assert got.filter(F.col("username") == "u_042").select("id").first()[0] == 42
    # file pruning through pushFilters on the RENAMED column
    ds = DeltaLiteDataSource(options={"path": table})
    r = ds.reader(ds.schema())
    list(r.pushFilters([EqualTo(("username",), "u_999")]))
    assert len(r.partitions()) == 0


def test_delete_merge_compact_on_mapped_table(spark, tmp_path):
    table = _make(spark, tmp_path)
    enable_column_mapping(table)
    rename_column(table, "name", "username")
    # dv-mode delete resolves the predicate over LOGICAL names
    delete_where(spark, table, "username = 'u_010'", mode="dv")
    # cow delete too
    delete_where(spark, table, "id = 11", mode="cow")
    src = spark.createDataFrame([(12, 2, "u_012_v2")], "id long, grp long, username string")
    merge_delta(spark, table, src, ["id"])
    compact_table(spark, table, min_files_per_partition=1)
    out = read_delta(spark, table)
    assert out.count() == 48
    assert out.filter(F.col("username").isin("u_010")).count() == 0
    assert out.filter(F.col("id") == 11).count() == 0
    assert out.filter(F.col("id") == 12).select("username").first()[0] == "u_012_v2"


def test_rename_only_commit_is_empty_in_change_feed(spark, tmp_path):
    table = _make(spark, tmp_path)
    enable_column_mapping(table)       # v1
    rename_column(table, "grp", "bucket")  # v2
    assert snapshot_diff(spark, table, 1, 2).count() == 0


def test_guardrails(spark, tmp_path):
    table = _make(spark, tmp_path)
    with pytest.raises(ValueError, match="enable_column_mapping"):
        rename_column(table, "name", "x")
    enable_column_mapping(table)
    with pytest.raises(ValueError, match="already enabled"):
        enable_column_mapping(table)
    with pytest.raises(KeyError):
        rename_column(table, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(table, "name", "grp")
    with pytest.raises(ValueError, match="merge_schema is not allowed"):
        extra = spark.createDataFrame([(1, 1, "a", 5)], "id long, grp long, name string, extra long")
        write_delta(extra, table, mode="append", merge_schema=True)
