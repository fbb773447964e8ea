"""Iceberg changelog read (VERDICT r10 ask #2 — CDF parity with
delta_lite): the batch ``iceberg_table_changes`` derivation and the
streaming tail's ``changelog`` mode, across every DML kind, compaction,
retention expiry, and both identity- and transform-partitioned layouts.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.sources.iceberg_lite import (
    compact_iceberg,
    delete_where,
    expire_snapshots,
    iceberg_table_changes,
    read_iceberg,
    update_where,
    upsert_by_key,
    write_iceberg,
)
from big_data_analytics_machine_learning_poc_spark.sources.pyds_iceberg import (
    IcebergChangePartition,
    IcebergLiteStreamReader,
)


@pytest.fixture
def table():
    path = tempfile.mkdtemp(prefix="ice_cdf_test_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("b"),
        (F.col("id") * 1.0).alias("v"),
    )


def _timeline(spark, table):
    """seq1 load 20, seq2 append 5, seq3 delete id<3, seq4 update id=10,
    seq5 upsert ids 8..11 (all pre-existing), seq6 compact (replace)."""
    write_iceberg(_frame(spark, 0, 20), table, partition_cols=["b"])
    write_iceberg(_frame(spark, 20, 25), table, mode="append")
    delete_where(spark, table, "id < 3")
    update_where(spark, table, {"v": "v + 100"}, "id = 10")
    upsert_by_key(
        spark, table, _frame(spark, 8, 12).withColumn("v", F.lit(-1.0)), ["id"]
    )
    compact_iceberg(spark, table)


def test_changelog_replays_to_current_state(spark, table):
    """The fundamental changelog invariant: inserts minus deletes (as
    multisets) reproduce the current table exactly, across append, DELETE
    (position deletes), UPDATE (pos-delete + insert pair), upsert
    (equality deletes + inserts) and compaction (emits nothing)."""
    _timeline(spark, table)
    ch = iceberg_table_changes(spark, table, from_seq=0)
    counts = {
        (r._commit_seq, r._change_type): r["count"]
        for r in ch.groupBy("_commit_seq", "_change_type").count().collect()
    }
    assert counts == {
        (1, "insert"): 20,
        (2, "insert"): 5,
        (3, "delete"): 3,
        (4, "delete"): 1,
        (4, "insert"): 1,
        (5, "delete"): 4,  # ids 8..11 all had live pre-images
        (5, "insert"): 4,
    }  # seq 6 (replace) emits nothing
    cur = read_iceberg(spark, table).select("id", "b", "v")
    ins = ch.filter("_change_type = 'insert'").select("id", "b", "v")
    dl = ch.filter("_change_type = 'delete'").select("id", "b", "v")
    replay = ins.exceptAll(dl)
    assert replay.exceptAll(cur).count() == 0
    assert cur.exceptAll(replay).count() == 0


def test_changelog_preimages_are_exact(spark, table):
    """Deletes carry full pre-images: the UPDATE's delete row holds the
    OLD value; the upsert's delete rows hold the pre-upsert images of
    only the keys that existed."""
    _timeline(spark, table)
    ch = iceberg_table_changes(spark, table, from_seq=3, to_seq=5)
    upd = ch.filter("_commit_seq = 4").orderBy("_change_type").collect()
    assert [(r._change_type, r.id, r.v) for r in upd] == [
        ("delete", 10, 10.0),
        ("insert", 10, 110.0),
    ]
    ups_del = {
        (r.id, r.v)
        for r in ch.filter("_commit_seq = 5 and _change_type = 'delete'").collect()
    }
    assert ups_del == {(8, 8.0), (9, 9.0), (10, 110.0), (11, 11.0)}


def test_changelog_upsert_new_keys_delete_nothing(spark, table):
    write_iceberg(_frame(spark, 0, 10), table)
    upsert_by_key(
        spark, table, _frame(spark, 100, 103).withColumn("v", F.lit(7.0)), ["id"]
    )
    ch = iceberg_table_changes(spark, table, from_seq=1)
    assert ch.filter("_change_type = 'delete'").count() == 0
    assert ch.filter("_change_type = 'insert'").count() == 3


def test_changelog_full_overwrite_emits_delete_then_insert(spark, table):
    write_iceberg(_frame(spark, 0, 10), table)
    delete_where(spark, table, "id = 4")  # parent delete state must apply
    write_iceberg(_frame(spark, 50, 53), table, mode="overwrite")
    ch = iceberg_table_changes(spark, table, from_seq=2)
    dels = {r.id for r in ch.filter("_change_type = 'delete'").collect()}
    ins = {r.id for r in ch.filter("_change_type = 'insert'").collect()}
    assert dels == set(range(10)) - {4}  # as visible at the parent
    assert ins == {50, 51, 52}


def test_changelog_overwrite_across_spec_change_keeps_preimages(spark, table):
    """VERDICT r11 #2 (reproduced): a partitioned table (spec-id 0)
    overwritten by an UNPARTITIONED write changes the default spec; the
    delete pre-images must still carry the parent's identity-partition
    values. `pspec or cur_spec` treated the falsy spec-id 0 as missing
    and re-scanned the removed files under the overwrite's spec, NULLing
    the partition column in every pre-image row."""
    write_iceberg(_frame(spark, 0, 6), table, partition_cols=["b"])
    write_iceberg(_frame(spark, 50, 52), table, mode="overwrite")
    ch = iceberg_table_changes(spark, table, from_seq=1)
    dels = sorted(
        (r.id, r.b, r.v)
        for r in ch.filter("_change_type = 'delete'").collect()
    )
    assert dels == [(i, i % 3, float(i)) for i in range(6)]
    assert all(b is not None for _i, b, _v in dels)
    ins = {r.id for r in ch.filter("_change_type = 'insert'").collect()}
    assert ins == {50, 51}


def test_changelog_retention_gap_raises(spark, table):
    write_iceberg(_frame(spark, 0, 10), table)
    write_iceberg(_frame(spark, 10, 20), table, mode="append")
    delete_where(spark, table, "id = 1")
    expire_snapshots(table, keep_last=1)
    with pytest.raises(RuntimeError, match="expired"):
        iceberg_table_changes(spark, table, from_seq=0)
    # expired compaction replaces stay exempt
    t2 = table + "_r"
    write_iceberg(_frame(spark, 0, 10).repartition(3), t2)
    write_iceberg(_frame(spark, 10, 15), t2, mode="append")
    compact_iceberg(spark, t2)
    write_iceberg(_frame(spark, 15, 18), t2, mode="append")
    expire_snapshots(t2, keep_last=2)  # expires seqs 1-2... and replace 3
    with pytest.raises(RuntimeError, match="expired"):
        iceberg_table_changes(spark, t2, from_seq=0)
    ch = iceberg_table_changes(spark, t2, from_seq=3)  # only the new append
    assert ch.groupBy("_change_type").count().collect()[0]["count"] == 3
    shutil.rmtree(t2, ignore_errors=True)


def test_changelog_on_transform_partitioned_table(spark, table):
    df = spark.range(0, 48).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 3600).alias("ts"),
        (F.col("id") * 1.0).alias("v"),
    )
    write_iceberg(df, table, partition_cols=["days(ts)"])
    delete_where(spark, table, "id < 5")
    ch = iceberg_table_changes(spark, table, from_seq=1)
    assert {r.id for r in ch.collect()} == {0, 1, 2, 3, 4}
    assert ch.columns == ["id", "ts", "v", "_change_type", "_commit_seq"]


# ---------------------------------------------------------------------------
# streaming changelog mode
# ---------------------------------------------------------------------------


def _drain(reader, start=0):
    rows = []
    parts = reader.partitions({"seq": start}, reader.latestOffset())
    for p in parts:
        for batch in reader.read(p):
            d = batch.to_pydict()
            n = len(d["_change_type"])
            rows += [
                {k: d[k][i] for k in d} for i in range(n)
            ]
    return rows


def test_stream_changelog_emits_all_dml(spark, table):
    _timeline(spark, table)
    r = IcebergLiteStreamReader(table, changelog=True)
    rows = _drain(r)
    by = {}
    for row in rows:
        by.setdefault((row["_commit_seq"], row["_change_type"]), []).append(row)
    assert len(by[(1, "insert")]) == 20 and len(by[(2, "insert")]) == 5
    # position deletes: exact pre-images
    assert {(r["id"], r["v"]) for r in by[(3, "delete")]} == {
        (0, 0.0), (1, 1.0), (2, 2.0)
    }
    assert [(r["id"], r["v"]) for r in by[(4, "delete")]] == [(10, 10.0)]
    assert [(r["id"], r["v"]) for r in by[(4, "insert")]] == [(10, 110.0)]
    # equality deletes: KEY-ONLY rows (Flink-CDC shape), non-keys null
    eq = by[(5, "delete")]
    assert {r["id"] for r in eq} == {8, 9, 10, 11}
    assert all(r["v"] is None and r["b"] is None for r in eq)
    assert {r["id"] for r in by[(5, "insert")]} == {8, 9, 10, 11}
    # compaction (seq 6) emitted nothing
    assert not any(seq == 6 for seq, _t in by)


def test_stream_changelog_end_to_end(spark, table):
    from big_data_analytics_machine_learning_poc_spark.sources.pyds_iceberg import (
        IcebergLiteStreamDataSource,
    )

    _timeline(spark, table)
    spark.dataSource.register(IcebergLiteStreamDataSource)
    stream = (
        spark.readStream.format("iceberg_lite_stream")
        .option("changelog", "true")
        .load(table)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ice_cl_e2e")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "select _commit_seq, _change_type, count(*) n from ice_cl_e2e "
        "group by 1, 2 order by 1, 2"
    ).collect()
    assert [(r._commit_seq, r._change_type, r.n) for r in got] == [
        (1, "insert", 20),
        (2, "insert", 5),
        (3, "delete", 3),
        (4, "delete", 1),
        (4, "insert", 1),
        (5, "delete", 4),
        (5, "insert", 4),
    ]


def test_stream_append_only_still_raises_without_changelog(spark, table):
    write_iceberg(_frame(spark, 0, 10), table)
    delete_where(spark, table, "id = 1")
    r = IcebergLiteStreamReader(table)
    with pytest.raises(RuntimeError, match="append-only"):
        r.partitions({"seq": 0}, r.latestOffset())


def test_stream_changelog_full_overwrite_raises(spark, table):
    write_iceberg(_frame(spark, 0, 10), table)
    write_iceberg(_frame(spark, 50, 53), table, mode="overwrite")
    r = IcebergLiteStreamReader(table, changelog=True)
    with pytest.raises(RuntimeError, match="FULL overwrite"):
        r.partitions({"seq": 0}, r.latestOffset())


def test_stream_changelog_identity_partition_constants(spark, table):
    """Identity partition values come back as typed constants; the
    position-delete pre-images resolve their target file's dir values."""
    write_iceberg(_frame(spark, 0, 12).repartition("b"), table, partition_cols=["b"])
    delete_where(spark, table, "id = 7")
    r = IcebergLiteStreamReader(table, changelog=True)
    rows = _drain(r)
    dels = [x for x in rows if x["_change_type"] == "delete"]
    assert [(d["id"], d["b"]) for d in dels] == [(7, 1)]
    assert all(x["b"] in (0, 1, 2) for x in rows if x["_change_type"] == "insert")


def test_stream_changelog_transform_partition_inserts(spark, table):
    """Transform-partitioned (days) appends stream correctly: the source
    column comes from the data file, no derived constant is injected."""
    df = spark.range(0, 48).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 3600).alias("ts"),
    )
    write_iceberg(df, table, partition_cols=["days(ts)"])
    r = IcebergLiteStreamReader(table, changelog=True)
    rows = _drain(r)
    assert len(rows) == 48
    assert all(x["ts"] is not None for x in rows)
    parts = r.partitions({"seq": 0}, r.latestOffset())
    assert all(isinstance(p, IcebergChangePartition) for p in parts)
    assert all(p.partition_values == {} for p in parts)  # hidden, not derived


def test_stream_changelog_pv_map_scales_with_change(spark, table):
    """VERDICT r11 #6: a pos-delete partition's target_pv must carry ONLY
    its delete file's actual target paths, not the snapshot-wide data-file
    map — InputPartitions pickle to executors, so the payload must scale
    with the change, not the table."""
    # four separate commits x 3 partition dirs -> >= 9 distinct data files;
    # the deletes then touch exactly 2 of them
    from big_data_analytics_machine_learning_poc_spark.sources.iceberg_lite import plan_scan

    write_iceberg(_frame(spark, 0, 10), table, partition_cols=["b"])
    for lo in (10, 20, 30):
        write_iceberg(_frame(spark, lo, lo + 10), table, mode="append")
    n_data_files = len(plan_scan(table)["files"])
    assert n_data_files >= 9
    delete_where(spark, table, "id IN (3, 7)")
    r = IcebergLiteStreamReader(table, changelog=True)
    parts = r.partitions({"seq": 1}, r.latestOffset())
    pos = [p for p in parts if p.kind == "pos_delete"]
    assert pos
    for p in pos:
        assert 0 < len(p.target_pv) <= 2  # targets only, not all files
        assert len(p.target_pv) < n_data_files
    # and the emitted pre-images are still exact
    rows = _drain(r, start=1)
    dels = sorted(
        (row["id"], row["b"], row["v"])
        for row in rows
        if row["_change_type"] == "delete"
    )
    assert dels == [(3, 0, 3.0), (7, 1, 7.0)]
