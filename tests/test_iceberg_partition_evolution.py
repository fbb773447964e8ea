"""Partition-spec evolution (r12, spec §Partition Evolution):
``evolve_partition_spec`` changes the table's DEFAULT layout as a
metadata-only commit; existing files keep their immutable spec, appends
land under the new one, scans read mixed layouts as one grouped union,
pruning runs per manifest under its own spec, DML and the changelog work
across the mix, and compaction migrates everything to the default."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.sources.iceberg_lite import (
    compact_iceberg,
    delete_where,
    drop_column,
    evolve_partition_spec,
    iceberg_table_changes,
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
    path = tempfile.mkdtemp(prefix="ice_pspec_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("b"),
        (F.col("id") * 1.0).alias("v"),
    )


def test_evolution_is_metadata_only_and_appends_adopt(spark, table):
    write_iceberg(_frame(spark, 0, 6), table)  # spec 0: unpartitioned
    files_before = sorted(plan_scan(table)["files"])
    sid = evolve_partition_spec(table, ["b"])
    assert sid == 1
    # zero snapshots, zero files touched
    assert sorted(plan_scan(table)["files"]) == files_before
    assert len(snapshots(table)) == 1
    # the next append lands under the NEW layout
    write_iceberg(_frame(spark, 6, 12), table, mode="append")
    plan = plan_scan(table)
    assert set(plan["file_specs"].values()) == {0, 1}
    new_files = [f for f, s in plan["file_specs"].items() if s == 1]
    assert new_files and all("b=" in f for f in new_files)
    old_files = [f for f, s in plan["file_specs"].items() if s == 0]
    assert old_files and all("b=" not in f for f in old_files)
    # the mixed read is exact
    back = read_iceberg(spark, table)
    assert sorted((r.id, r.b, r.v) for r in back.collect()) == [
        (i, i % 3, float(i)) for i in range(12)
    ]


def test_evolution_reuses_existing_spec_id(spark, table):
    write_iceberg(_frame(spark, 0, 3), table, partition_cols=["b"])  # spec 0
    assert evolve_partition_spec(table, None) == 1  # unpartitioned minted
    assert evolve_partition_spec(table, ["b"]) == 0  # back: REUSED, not minted
    assert evolve_partition_spec(table, ["b"]) == 0  # already default: no-op
    meta_specs = plan_scan(table)  # table still reads fine
    assert meta_specs["files"]


def test_mixed_spec_pruning_per_manifest(spark, table):
    """A scan_filter prunes old-layout files via column bounds and
    new-layout files via the transform — each manifest under ITS spec."""
    df = spark.range(0, 48).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 3600).alias("ts"),
        (F.col("id") * 1.0).alias("v"),
    )
    write_iceberg(df.repartition(4), table)  # spec 0: unpartitioned
    evolve_partition_spec(table, ["days(ts)"])
    df2 = spark.range(48, 96).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 3600).alias("ts"),
        (F.col("id") * 1.0).alias("v"),
    )
    write_iceberg(df2, table, mode="append")  # spec 1: days(ts) dirs
    plan_all = plan_scan(table)
    assert set(plan_all["file_specs"].values()) == {0, 1}
    # day 3 (ids 72..95 are days 3-4; pick 2024-01-04) lives only in
    # new-layout files: the days() transform must prune to ~1 day of them
    plan = plan_scan(
        table, scan_filter=("ts", "2024-01-04 00:00:00", "2024-01-04 23:59:59")
    )
    new_kept = [f for f in plan["files"] if plan["file_specs"][f] == 1]
    new_all = [f for f, s in plan_all["file_specs"].items() if s == 1]
    assert 0 < len(new_kept) < len(new_all)
    assert all("ts_day=2024-01-04" in f for f in new_kept)
    got = read_iceberg(
        spark, table,
        scan_filter=("ts", "2024-01-04 00:00:00", "2024-01-04 23:59:59"),
    ).filter("ts >= '2024-01-04' and ts < '2024-01-05'")
    assert got.count() == 24


def test_partition_filters_on_mixed_layout_raise(spark, table):
    write_iceberg(_frame(spark, 0, 6), table)
    evolve_partition_spec(table, ["b"])
    write_iceberg(_frame(spark, 6, 9), table, mode="append")
    with pytest.raises(NotImplementedError, match="mixed layouts"):
        plan_scan(table, partition_filters={"b": 1})
    # uniform snapshots keep working
    t2 = table + "_u"
    write_iceberg(_frame(spark, 0, 6), t2, partition_cols=["b"])
    assert plan_scan(t2, partition_filters={"b": 1})["files"]
    shutil.rmtree(t2, ignore_errors=True)


def test_dml_across_mixed_layout(spark, table):
    write_iceberg(_frame(spark, 0, 10), table)
    evolve_partition_spec(table, ["b"])
    write_iceberg(_frame(spark, 10, 20), table, mode="append")
    delete_where(spark, table, "id IN (2, 12)")  # one row per layout
    update_where(spark, table, {"v": "v + 100"}, "id IN (3, 13)")
    upsert_by_key(
        spark, table, _frame(spark, 5, 6).withColumn("v", F.lit(-1.0)), ["id"]
    )
    back = {r.id: r.v for r in read_iceberg(spark, table).collect()}
    assert set(back) == set(range(20)) - {2, 12}
    assert back[3] == 103.0 and back[13] == 113.0
    assert back[5] == -1.0
    # DML results staged under the DEFAULT (new) spec
    plan = plan_scan(table)
    assert 1 in set(plan["file_specs"].values())


def test_compaction_migrates_to_default_spec(spark, table):
    write_iceberg(_frame(spark, 0, 9).repartition(3), table)  # spec 0
    evolve_partition_spec(table, ["b"])
    write_iceberg(_frame(spark, 9, 12), table, mode="append")
    stats = compact_iceberg(spark, table, min_files_per_partition=2)
    assert stats["snapshot_id"] is not None
    plan = plan_scan(table)
    # one uniform layout again: everything under the new default
    assert set(plan["file_specs"].values()) == {1}
    assert all("b=" in f for f in plan["files"])
    back = read_iceberg(spark, table)
    assert sorted((r.id, r.v) for r in back.collect()) == [
        (i, float(i)) for i in range(12)
    ]


def test_changelog_across_mixed_layout(spark, table):
    write_iceberg(_frame(spark, 0, 6), table, partition_cols=["b"])
    evolve_partition_spec(table, None)
    write_iceberg(_frame(spark, 6, 9), table, mode="append")
    delete_where(spark, table, "id IN (1, 7)")  # one per layout
    ch = iceberg_table_changes(spark, table, from_seq=0)
    dels = sorted((r.id, r.b) for r in ch.filter("_change_type = 'delete'").collect())
    assert dels == [(1, 1), (7, 1)]  # partition values exact on BOTH layouts
    ins = {r.id for r in ch.filter("_change_type = 'insert'").collect()}
    assert ins == set(range(9))


def test_changelog_eq_preimages_after_key_rename(spark, table):
    """r12 review find: the changelog's eq pre-image key read used the
    LOGICAL name — after renaming a key column, keys null-filled and the
    pre-images silently vanished."""
    write_iceberg(_frame(spark, 0, 6), table)
    rename_column(table, "id", "key")
    src = _frame(spark, 2, 4).withColumnRenamed("id", "key").withColumn(
        "v", F.lit(-1.0)
    )
    upsert_by_key(spark, table, src, ["key"])
    ch = iceberg_table_changes(spark, table, from_seq=1)
    dels = sorted(
        (r.key, r.v) for r in ch.filter("_change_type = 'delete'").collect()
    )
    assert dels == [(2, 2.0), (3, 3.0)]  # exact pre-images, not empty
    ins = sorted(
        (r.key, r.v) for r in ch.filter("_change_type = 'insert'").collect()
    )
    assert ins == [(2, -1.0), (3, -1.0)]


def test_time_travel_across_evolution(spark, table):
    s1 = write_iceberg(_frame(spark, 0, 6), table, partition_cols=["b"])
    evolve_partition_spec(table, None)
    write_iceberg(_frame(spark, 6, 9), table, mode="append")
    old = read_iceberg(spark, table, snapshot_id=s1)
    assert sorted((r.id, r.b) for r in old.collect()) == [
        (i, i % 3) for i in range(6)
    ]


def test_evolution_guards(spark, table):
    with pytest.raises(ValueError, match="existing table"):
        evolve_partition_spec(table + "_nope", ["b"])
    write_iceberg(_frame(spark, 0, 3), table)
    with pytest.raises(KeyError, match="not in schema"):
        evolve_partition_spec(table, ["nope"])
    # drop guard names the new escape hatch and it works
    evolve_partition_spec(table, ["b"])
    with pytest.raises(ValueError, match="evolve_partition_spec"):
        drop_column(table, "b")
    evolve_partition_spec(table, None)
    drop_column(table, "b")
    assert read_iceberg(spark, table).columns == ["id", "v"]


def test_evolution_after_partition_source_rename(spark, table):
    """Evolving to a layout on a RENAMED column uses the physical name —
    same spec-id as the pre-rename layout, dirs identical."""
    write_iceberg(_frame(spark, 0, 6), table, partition_cols=["b"])  # spec 0
    evolve_partition_spec(table, None)  # spec 1
    rename_column(table, "b", "bucket_col")
    assert evolve_partition_spec(table, ["bucket_col"]) == 0  # REUSED
    write_iceberg(
        _frame(spark, 6, 9).withColumnRenamed("b", "bucket_col"),
        table,
        mode="append",
    )
    plan = plan_scan(table)
    assert all("b=" in f for f in plan["files"])
    assert read_iceberg(spark, table).count() == 9
