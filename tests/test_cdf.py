"""Change Data Feed (sources/delta_lite.py + the delta_lite_cdf stream
source): written per-commit typed changes.

Contracts: DELETE/UPDATE/MERGE commits carry their change rows in cdc
actions atomically; table_changes reconstructs exact typed rows per
commit (appends = inserts, overwrites = deletes + inserts, pre-CDF DML
raises); vacuum never reclaims log-referenced change files; the streaming
source replays the same feed through Structured Streaming and refuses
commits whose removes carry no row-level meaning.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
    delete_where,
    enable_change_data_feed,
    merge_delta,
    read_delta,
    table_changes,
    update_where,
    vacuum_table,
    write_delta,
)


def _make(spark, tmp_path, name="t"):
    table = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i * 10, f"r{i}") for i in range(10)], "id long, val long, tag string"
    )
    write_delta(df, table)          # v0
    enable_change_data_feed(table)  # v1
    return table


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("id", "val", "_change_type", "_commit_version").collect()
    )


def test_dml_changes_exact(spark, tmp_path):
    table = _make(spark, tmp_path)
    delete_where(spark, table, "id IN (2, 3)", mode="dv")          # v2
    update_where(spark, table, {"val": "val + 1"}, "id = 5")       # v3 cow
    update_where(spark, table, {"val": "val + 2"}, "id = 6", mode="dv")  # v4 mor
    src = spark.createDataFrame(
        [(7, 700, "r7x"), (99, 990, "new")], "id long, val long, tag string"
    )
    merge_delta(spark, table, src, ["id"])                         # v5
    assert _rows(table_changes(spark, table, 1, 2)) == [
        (2, 20, "delete", 2),
        (3, 30, "delete", 2),
    ]
    assert _rows(table_changes(spark, table, 2, 3)) == [
        (5, 50, "update_preimage", 3),
        (5, 51, "update_postimage", 3),
    ]
    assert _rows(table_changes(spark, table, 3, 4)) == [
        (6, 60, "update_preimage", 4),
        (6, 62, "update_postimage", 4),
    ]
    assert _rows(table_changes(spark, table, 4, 5)) == [
        (7, 70, "update_preimage", 5),
        (7, 700, "update_postimage", 5),
        (99, 990, "insert", 5),
    ]
    # the whole feed replays the table: base + inserts/postimages applied
    assert read_delta(spark, table).count() == 9


def test_append_and_overwrite_derive_without_cdc(spark, tmp_path):
    table = _make(spark, tmp_path)
    write_delta(
        spark.createDataFrame([(50, 500, "x")], "id long, val long, tag string"),
        table,
        mode="append",
    )  # v2
    assert _rows(table_changes(spark, table, 1, 2)) == [(50, 500, "insert", 2)]
    # an overwrite's removed snapshot re-emerges as deletes + new inserts
    write_delta(
        spark.createDataFrame([(1, 11, "only")], "id long, val long, tag string"),
        table,
        mode="overwrite",
    )  # v3
    ch = _rows(table_changes(spark, table, 2, 3))
    dels = [c for c in ch if c[2] == "delete"]
    ins = [c for c in ch if c[2] == "insert"]
    assert len(dels) == 11 and ins == [(1, 11, "insert", 3)]


def test_overwrite_deletes_respect_deletion_vectors(spark, tmp_path):
    table = _make(spark, tmp_path)
    delete_where(spark, table, "id = 4", mode="dv")  # v2: 4 is dead
    write_delta(
        spark.createDataFrame([(0, 0, "z")], "id long, val long, tag string"),
        table,
        mode="overwrite",
    )  # v3
    dels = [c for c in _rows(table_changes(spark, table, 2, 3)) if c[2] == "delete"]
    # the DV'd row 4 was already dead before the overwrite: not re-deleted
    assert len(dels) == 9
    assert not any(c[0] == 4 for c in dels)


def test_pre_cdf_dml_raises_and_vacuum_keeps_change_files(spark, tmp_path):
    table = str(tmp_path / "pre")
    write_delta(
        spark.createDataFrame([(1, 1, "a"), (2, 2, "b")], "id long, val long, tag string"),
        table,
    )  # v0
    delete_where(spark, table, "id = 1")  # v1, no CDF yet
    enable_change_data_feed(table)        # v2
    delete_where(spark, table, "id = 2")  # v3, with CDF
    with pytest.raises(ValueError, match="without a change feed"):
        table_changes(spark, table, 0, 3).collect()
    assert _rows(table_changes(spark, table, 2, 3).select(
        "id", "val", "_change_type", "_commit_version"
    )) == [(2, 2, "delete", 3)]
    # vacuum must not reclaim the log-referenced change file
    vacuum_table(table, retention_ms=0, orphan_grace_ms=0)
    assert _rows(table_changes(spark, table, 2, 3).select(
        "id", "val", "_change_type", "_commit_version"
    )) == [(2, 2, "delete", 3)]


def test_cdf_under_column_mapping(spark, tmp_path):
    from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
        enable_column_mapping,
        rename_column,
    )

    table = _make(spark, tmp_path, name="map")
    enable_column_mapping(table)      # v2
    rename_column(table, "val", "score")  # v3
    update_where(spark, table, {"score": "score * 2"}, "id = 1")  # v4
    ch = table_changes(spark, table, 3, 4)
    assert "score" in ch.columns
    got = sorted(
        (r["id"], r["score"], r["_change_type"]) for r in ch.collect()
    )
    assert got == [(1, 10, "update_preimage"), (1, 20, "update_postimage")]


def test_streaming_cdf_source(spark, tmp_path):
    from big_data_analytics_machine_learning_poc_spark.sources.pyds import (
        DeltaLiteCDFStreamDataSource,
    )

    spark.dataSource.register(DeltaLiteCDFStreamDataSource)
    table = _make(spark, tmp_path, name="s")
    delete_where(spark, table, "id = 2", mode="dv")                # v2
    update_where(spark, table, {"val": "val + 1"}, "id = 5")       # v3
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("delta_lite_cdf")
        .load(table)
        .writeStream.format("memory")
        .queryName("cdf_stream_t")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["id"], r["val"], r["_change_type"], r["_commit_version"])
        for r in spark.sql("select * from cdf_stream_t").collect()
    )
    assert (2, 20, "delete", 2) in got
    assert (5, 50, "update_preimage", 3) in got and (5, 51, "update_postimage", 3) in got
    assert sum(1 for g in got if g[2] == "insert" and g[3] == 0) == 10
    # incremental: a new commit arrives; the reader plans ONLY its files
    # for the (3, 4] offset range (the memory sink can't recover a
    # checkpoint, so the offset mechanics are asserted reader-level —
    # end-to-end checkpointed recovery is covered by the delta_lite sink
    # tests, which share the offset plumbing)
    from big_data_analytics_machine_learning_poc_spark.sources.pyds import (
        DeltaLiteCDFStreamReader,
    )

    write_delta(
        spark.createDataFrame([(77, 770, "n")], "id long, val long, tag string"),
        table,
        mode="append",
    )  # v4
    r = DeltaLiteCDFStreamReader(table)
    parts = r.partitions({"version": 3}, {"version": 4})
    assert parts and all(
        p.change_type == "insert" and p.version == 4 for p in parts
    )


def test_streaming_cdf_refuses_pre_cdf_removes(spark, tmp_path):
    from big_data_analytics_machine_learning_poc_spark.sources.pyds import (
        DeltaLiteCDFStreamReader,
    )

    table = str(tmp_path / "refuse")
    write_delta(
        spark.createDataFrame([(1, 1, "a")], "id long, val long, tag string"), table
    )
    delete_where(spark, table, "id = 1")  # no CDF
    r = DeltaLiteCDFStreamReader(table)
    with pytest.raises(RuntimeError, match="without a change feed"):
        r.partitions({"version": 0}, {"version": 1})
