"""Iceberg rename_column / drop_column (VERDICT r11 missing #1 — parity
with delta_lite's column mapping, tests/test_column_mapping.py as the
model): metadata-only schema evolution on field ids, with parquet files
and hive dirs keeping PHYSICAL (creation) names via the spec's
``schema.name-mapping.default`` property. Covers reads, time travel, DML
after rename, equality deletes across renames, transform layouts, the
streaming tail, and the drop guards."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_analytics_machine_learning_poc_spark.sources.iceberg_lite import (
    _NAME_MAPPING_KEY,
    add_column,
    compact_iceberg,
    delete_where,
    drop_column,
    iceberg_table_changes,
    load_metadata,
    merge_iceberg,
    plan_scan,
    read_iceberg,
    rename_column,
    snapshots,
    update_where,
    upsert_by_key,
    write_iceberg,
)


@pytest.fixture
def table():
    path = tempfile.mkdtemp(prefix="ice_evo_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("b"),
        (F.col("id") * 1.0).alias("v"),
    )


def test_rename_is_metadata_only_and_time_travel_sees_old_name(spark, table):
    snap1 = write_iceberg(_frame(spark, 0, 10), table)
    files_before = sorted(plan_scan(table)["files"])
    rename_column(table, "v", "value")
    # metadata-only: zero snapshots added, zero files moved
    assert sorted(plan_scan(table)["files"]) == files_before
    assert len(snapshots(table)) == 1
    cur = read_iceberg(spark, table)
    assert cur.columns == ["id", "b", "value"]
    assert sorted((r.id, r.value) for r in cur.collect()) == [
        (i, float(i)) for i in range(10)
    ]
    # time travel to the pre-rename snapshot reads the OLD name
    old = read_iceberg(spark, table, snapshot_id=snap1)
    assert old.columns == ["id", "b", "v"]
    # the name mapping records the chain, physical first
    props = load_metadata(table).get("properties", {})
    mapping = {e["field-id"]: e["names"] for e in json.loads(props[_NAME_MAPPING_KEY])}
    assert ["v", "value"] in mapping.values()


def test_append_after_rename_writes_physical_names(spark, table):
    import pyarrow.parquet as pq

    write_iceberg(_frame(spark, 0, 5), table)
    rename_column(table, "v", "value")
    src = _frame(spark, 5, 10).withColumnRenamed("v", "value")
    write_iceberg(src, table, mode="append")
    # EVERY data file — pre- and post-rename — carries the physical name
    for f in plan_scan(table)["files"]:
        assert "v" in pq.ParquetFile(f).schema_arrow.names
        assert "value" not in pq.ParquetFile(f).schema_arrow.names
    back = read_iceberg(spark, table)
    assert back.columns == ["id", "b", "value"]
    assert back.count() == 10
    assert back.filter("value >= 5.0").count() == 5


def test_rename_partition_source_column(spark, table):
    """Renaming an identity partition source moves NO directories: spec
    field names and hive dirs stay physical; reads alias back."""
    write_iceberg(_frame(spark, 0, 9), table, partition_cols=["b"])
    rename_column(table, "b", "bucket_col")
    back = read_iceberg(spark, table)
    assert back.columns == ["id", "bucket_col", "v"]
    assert sorted(r.bucket_col for r in back.filter("id < 3").collect()) == [0, 1, 2]
    # partition pruning still works under the (physical) spec field name
    plan = plan_scan(table, partition_filters={"b": 1})
    assert 0 < len(plan["files"]) < plan_scan(table)["files_total_in_read"]
    # appends after the rename land in the same hive layout
    src = _frame(spark, 9, 12).withColumnRenamed("b", "bucket_col")
    write_iceberg(src, table, mode="append")
    assert all("b=" in f for f in plan_scan(table)["files"])
    assert read_iceberg(spark, table).count() == 12
    # compaction round-trips the spec through its terms (logical) back to
    # the same physical spec field — same spec-id, same hive layout
    stats = compact_iceberg(spark, table)
    assert stats["snapshot_id"] is not None
    assert all("b=" in f for f in plan_scan(table)["files"])
    back2 = read_iceberg(spark, table)
    assert back2.columns == ["id", "bucket_col", "v"]
    assert back2.count() == 12


def test_dml_after_rename(spark, table):
    write_iceberg(_frame(spark, 0, 10), table)
    rename_column(table, "v", "value")
    delete_where(spark, table, "id < 2")
    update_where(spark, table, {"value": "value + 100"}, "id = 5")
    src = _frame(spark, 8, 12).withColumnRenamed("v", "value").withColumn(
        "value", F.lit(-1.0)
    )
    merge_iceberg(spark, table, src, ["id"])
    back = {r.id: r.value for r in read_iceberg(spark, table).collect()}
    assert set(back) == set(range(2, 12))
    assert back[5] == 105.0
    assert all(back[k] == -1.0 for k in (8, 9, 10, 11))


def test_equality_deletes_across_rename(spark, table):
    """An upsert BEFORE the rename (key file under the old physical name)
    and an upsert AFTER it must both apply on reads."""
    write_iceberg(_frame(spark, 0, 6), table)
    upsert_by_key(
        spark, table, _frame(spark, 0, 1).withColumn("v", F.lit(-1.0)), ["id"]
    )
    rename_column(table, "id", "key")
    src = (
        _frame(spark, 1, 2)
        .withColumnRenamed("id", "key")
        .withColumn("v", F.lit(-2.0))
    )
    upsert_by_key(spark, table, src, ["key"])
    back = {r.key: r.v for r in read_iceberg(spark, table).collect()}
    assert len(back) == 6
    assert back[0] == -1.0 and back[1] == -2.0
    # compaction materializes the debt under the renamed schema
    stats = compact_iceberg(spark, table)
    assert stats["snapshot_id"] is not None
    back2 = {r.key: r.v for r in read_iceberg(spark, table).collect()}
    assert back2 == back


def test_rename_on_transform_partitioned_table(spark, table):
    df = spark.range(0, 48).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 3600).alias("ts"),
        (F.col("id") * 1.0).alias("v"),
    )
    write_iceberg(df, table, partition_cols=["days(ts)"])
    rename_column(table, "ts", "event_time")
    # pruning maps the renamed SOURCE column range through the transform
    plan = plan_scan(
        table, scan_filter=("event_time", "2024-01-01 00:00:00", "2024-01-01 23:59:59")
    )
    assert 0 < len(plan["files"]) < plan_scan(table)["files_total_in_read"]
    got = read_iceberg(
        spark,
        table,
        scan_filter=("event_time", "2024-01-01 00:00:00", "2024-01-01 23:59:59"),
    )
    assert got.filter("event_time < '2024-01-02'").count() == 24


def test_changelog_after_rename(spark, table):
    write_iceberg(_frame(spark, 0, 5), table)
    rename_column(table, "v", "value")
    delete_where(spark, table, "id = 3")
    ch = iceberg_table_changes(spark, table, from_seq=0)
    assert ch.columns == ["id", "b", "value", "_change_type", "_commit_seq"]
    dels = [(r.id, r.value) for r in ch.filter("_change_type = 'delete'").collect()]
    assert dels == [(3, 3.0)]
    assert ch.filter("_change_type = 'insert'").count() == 5


def test_stream_tail_after_rename(spark, table):
    from big_data_analytics_machine_learning_poc_spark.sources.pyds_iceberg import (
        IcebergLiteStreamReader,
    )

    write_iceberg(_frame(spark, 0, 5), table, partition_cols=["b"])
    rename_column(table, "b", "bb")
    src = _frame(spark, 5, 8).withColumnRenamed("b", "bb")
    write_iceberg(src, table, mode="append")
    r = IcebergLiteStreamReader(table)
    rows = []
    for p in r.partitions({"seq": 0}, r.latestOffset()):
        for batch in r.read(p):
            d = batch.to_pydict()
            rows += list(zip(d["id"], d["bb"], d["v"]))
    assert sorted(rows) == [(i, i % 3, float(i)) for i in range(8)]


def test_drop_column_and_readd(spark, table):
    write_iceberg(_frame(spark, 0, 5), table)
    snap1 = snapshots(table)[-1]["snapshot_id"]
    drop_column(table, "v")
    cur = read_iceberg(spark, table)
    assert cur.columns == ["id", "b"]
    # time travel still carries the dropped column
    old = read_iceberg(spark, table, snapshot_id=snap1)
    assert old.columns == ["id", "b", "v"]
    assert old.filter("v = 4.0").count() == 1
    # re-adding the NAME mints a NEW field id: old bytes never resurface
    add_column(table, "v", T.DoubleType())
    back = read_iceberg(spark, table)
    assert back.columns == ["id", "b", "v"]
    assert all(r.v is None for r in back.collect())
    # appends under the re-added column round-trip
    write_iceberg(
        _frame(spark, 5, 7).withColumn("v", F.lit(9.0)), table, mode="append"
    )
    assert read_iceberg(spark, table).filter("v = 9.0").count() == 2


def test_drop_guards(spark, table):
    write_iceberg(_frame(spark, 0, 5), table, partition_cols=["b"])
    with pytest.raises(ValueError, match="partition field"):
        drop_column(table, "b")
    with pytest.raises(KeyError, match="not in the current schema"):
        drop_column(table, "nope")
    with pytest.raises(KeyError, match="not in the current schema"):
        rename_column(table, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(table, "v", "id")
    # dropping an equality-delete key column keeps reads loudly broken
    t2 = table + "_eq"
    write_iceberg(_frame(spark, 0, 5), t2)
    upsert_by_key(
        spark, t2, _frame(spark, 0, 1).withColumn("v", F.lit(-1.0)), ["id"]
    )
    drop_column(t2, "id")
    with pytest.raises(NotImplementedError, match="equality delete"):
        plan_scan(t2)
    shutil.rmtree(t2, ignore_errors=True)


def test_rename_chain_roundtrip(spark, table):
    """v -> a -> b: the chain keeps physical = creation name throughout."""
    import pyarrow.parquet as pq

    write_iceberg(_frame(spark, 0, 3), table)
    rename_column(table, "v", "a")
    rename_column(table, "a", "bcol")
    write_iceberg(
        _frame(spark, 3, 5).withColumnRenamed("v", "bcol"), table, mode="append"
    )
    for f in plan_scan(table)["files"]:
        assert "v" in pq.ParquetFile(f).schema_arrow.names
    back = read_iceberg(spark, table)
    assert back.columns == ["id", "b", "bcol"]
    assert sorted(r.bcol for r in back.collect()) == [float(i) for i in range(5)]


def test_changelog_raises_on_dropped_eq_key_column(spark, table):
    """Review r12 #1: an equality delete keyed on (id, b) must not
    silently narrow to (id,) in the CHANGELOG after drop_column(b) — the
    batch read already raises; _snapshot_state must match."""
    write_iceberg(_frame(spark, 0, 6), table)
    upsert_by_key(
        spark, table, _frame(spark, 0, 2).withColumn("v", F.lit(-1.0)),
        ["id", "b"],
    )
    drop_column(table, "b")
    with pytest.raises(NotImplementedError, match="equality delete"):
        iceberg_table_changes(spark, table, 0)


def test_add_column_synthesized_physical_never_collides(spark, table):
    """Review r12 #2: re-adding a dropped name when a column literally
    named f'{name}_{new_id}' exists must not alias that column's bytes."""
    df = spark.range(0, 4).select(
        F.col("id"),
        (F.col("id") * 1.0).alias("v"),      # field id 2
        (F.col("id") * 10.0).alias("v_4"),   # field id 3
    )
    write_iceberg(df, table)
    drop_column(table, "v")
    add_column(table, "v", T.DoubleType())  # id 4 → candidate 'v_4' taken
    back = read_iceberg(spark, table)
    assert back.columns == ["id", "v_4", "v"]
    rows = sorted((r.id, r.v_4, r.v) for r in back.collect())
    assert rows == [(i, i * 10.0, None) for i in range(4)]  # v_4 intact, v null
    # round-trip a write through the synthesized physical name
    write_iceberg(
        spark.range(4, 6).select(
            F.col("id"),
            (F.col("id") * 10.0).alias("v_4"),
            F.lit(7.0).alias("v"),
        ),
        table,
        mode="append",
    )
    got = read_iceberg(spark, table).filter("v = 7.0")
    assert sorted(r.id for r in got.collect()) == [4, 5]
    assert sorted(r.v_4 for r in got.collect()) == [40.0, 50.0]


def test_append_explicit_terms_after_partition_source_rename(spark, table):
    """Review r12 #3: an append naming the RENAMED partition source in
    partition_cols must pass the spec-identity check (spec names are
    physical; user terms are logical)."""
    write_iceberg(_frame(spark, 0, 6), table, partition_cols=["b"])
    rename_column(table, "b", "bucket_col")
    src = _frame(spark, 6, 9).withColumnRenamed("b", "bucket_col")
    write_iceberg(src, table, mode="append", partition_cols=["bucket_col"])
    assert read_iceberg(spark, table).count() == 9
    # a genuinely different spec still fails loudly
    with pytest.raises(ValueError, match="append partition spec"):
        write_iceberg(src, table, mode="append", partition_cols=["id"])


def test_stream_changelog_raises_on_dropped_eq_key_column(spark, table):
    """The STREAM twin of the batch guard: a changelog tail over an
    equality delete keyed on a since-dropped column must raise, not emit
    key-only rows narrowed to the surviving columns."""
    from big_data_analytics_machine_learning_poc_spark.sources.pyds_iceberg import (
        IcebergLiteStreamReader,
    )

    write_iceberg(_frame(spark, 0, 6), table)
    upsert_by_key(
        spark, table, _frame(spark, 0, 2).withColumn("v", F.lit(-1.0)),
        ["id", "b"],
    )
    drop_column(table, "b")
    r = IcebergLiteStreamReader(table, changelog=True)
    parts = r.partitions({"seq": 0}, r.latestOffset())
    eq = [p for p in parts if p.kind == "eq_delete"]
    assert eq
    with pytest.raises(RuntimeError, match="narrowed key"):
        for p in eq:
            list(r.read(p))
