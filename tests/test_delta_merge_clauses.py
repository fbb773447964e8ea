"""delta_lite MERGE WHEN-clause routing (r11 — parity with
merge_iceberg's clause surface on the copy-on-write engine)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
    enable_change_data_feed,
    merge_delta,
    read_delta,
    table_changes,
    write_delta,
)


@pytest.fixture
def table():
    path = tempfile.mkdtemp(prefix="delta_mrg_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 1.5).alias("v")
    )


def test_delta_merge_when_clauses(spark, table):
    write_delta(_frame(spark, 0, 20).repartition(3), table)
    src = _frame(spark, 5, 25).withColumn("v", F.col("id") * 10.0)
    merge_delta(
        spark,
        table,
        src,
        ["id"],
        when_matched=[
            ("t.id % 5 = 0", "delete"),                      # 5, 10, 15 die
            ("s.v >= 120", {"update": {"v": "s.v + t.v"}}),  # 12..19 minus %5
        ],
        when_not_matched_insert="id >= 22",                  # 22..24 insert
    )
    back = {r.id: r.v for r in read_delta(spark, table).collect()}
    for k in (5, 10, 15):
        assert k not in back
    for k in (12, 13, 14, 16, 17, 18, 19):
        assert back[k] == k * 10.0 + k * 1.5
    for k in (0, 1, 2, 3, 4, 6, 7, 8, 9, 11):
        assert back[k] == k * 1.5  # unmatched targets + untouched matches
    for k in (20, 21):
        assert k not in back
    for k in (22, 23, 24):
        assert back[k] == k * 10.0
    assert len(back) == 20


def test_delta_merge_default_unchanged(spark, table):
    """No clause args → historical upsert-all behavior."""
    write_delta(_frame(spark, 0, 10), table)
    src = _frame(spark, 5, 15).withColumn("v", F.lit(-1.0))
    merge_delta(spark, table, src, ["id"])
    back = {r.id: r.v for r in read_delta(spark, table).collect()}
    assert len(back) == 15
    for k in range(5):
        assert back[k] == k * 1.5
    for k in range(5, 15):
        assert back[k] == -1.0


def test_delta_merge_untouched_rows_of_hit_key_survive(spark, table):
    """A key whose target rows split across clause outcomes stays exact:
    the untouched-clause row is re-emitted, not lost with its file."""
    df = _frame(spark, 0, 4).unionByName(
        _frame(spark, 2, 3).withColumn("v", F.lit(500.0))  # second row, id=2
    )
    write_delta(df.coalesce(1), table)
    src = _frame(spark, 2, 3).withColumn("v", F.lit(-1.0))
    merge_delta(
        spark,
        table,
        src,
        ["id"],
        # only the ORIGINAL id=2 row (v=3.0) matches; the 500.0 twin stays
        when_matched=[("t.v < 100", {"update": {"v": "s.v"}})],
        when_not_matched_insert=False,
    )
    rows = sorted(
        (r.id, r.v) for r in read_delta(spark, table).filter("id = 2").collect()
    )
    assert rows == [(2, -1.0), (2, 500.0)]
    assert read_delta(spark, table).count() == 5


def test_delta_merge_hit_key_split_across_files(spark, table):
    """VERDICT r11 #1 (reproduced duplication): a hit key whose rows live
    in TWO files — one row hits a conditional clause (file A), its twin
    matches no clause (file B). The rewrite set must cover BOTH files:
    with only file A rewritten, the twin survives in place in file B AND
    is re-emitted by the untouched-of-hit-key path, silently duplicating
    it. Two separate appends guarantee the split (no coalesce(1))."""
    write_delta(_frame(spark, 0, 4).coalesce(1), table)  # id=2 v=3.0, file A
    write_delta(
        _frame(spark, 2, 3).withColumn("v", F.lit(500.0)).coalesce(1),
        table,
        mode="append",
    )  # id=2 v=500.0, file B
    src = _frame(spark, 2, 3).withColumn("v", F.lit(-1.0))
    merge_delta(
        spark,
        table,
        src,
        ["id"],
        when_matched=[("t.v < 100", {"update": {"v": "s.v"}})],
        when_not_matched_insert=False,
    )
    rows = sorted(
        (r.id, r.v) for r in read_delta(spark, table).filter("id = 2").collect()
    )
    assert rows == [(2, -1.0), (2, 500.0)]
    assert read_delta(spark, table).count() == 5


def test_delta_merge_hit_key_split_files_with_delete_clause(spark, table):
    """Same two-file split, delete clause: the conditional delete kills
    the file-A row; the file-B twin must survive exactly once."""
    write_delta(_frame(spark, 0, 4).coalesce(1), table)
    write_delta(
        _frame(spark, 2, 3).withColumn("v", F.lit(500.0)).coalesce(1),
        table,
        mode="append",
    )
    src = _frame(spark, 2, 3).withColumn("v", F.lit(-1.0))
    merge_delta(
        spark,
        table,
        src,
        ["id"],
        when_matched=[("t.v < 100", "delete")],
        when_not_matched_insert=False,
    )
    rows = sorted(
        (r.id, r.v) for r in read_delta(spark, table).filter("id = 2").collect()
    )
    assert rows == [(2, 500.0)]
    assert read_delta(spark, table).count() == 4


def test_delta_merge_clause_cdf_typed(spark, table):
    """CDF rows are typed per clause: deletes vs update pre/post pairs vs
    inserts."""
    write_delta(_frame(spark, 0, 10), table)
    enable_change_data_feed(table)
    src = _frame(spark, 8, 12).withColumn("v", F.lit(-1.0))
    v = merge_delta(
        spark,
        table,
        src,
        ["id"],
        when_matched=[
            ("t.id = 8", "delete"),
            (None, {"update": {"v": "s.v"}}),
        ],
        when_not_matched_insert=True,
    )
    ch = table_changes(spark, table, v - 1, v)
    got = sorted(
        (r.id, r._change_type) for r in ch.collect()
    )
    assert got == [
        (8, "delete"),
        (9, "update_postimage"),
        (9, "update_preimage"),
        (10, "insert"),
        (11, "insert"),
    ]


def test_delta_merge_insert_only_and_validation(spark, table):
    write_delta(_frame(spark, 0, 5), table)
    src = _frame(spark, 3, 8).withColumn("v", F.lit(-1.0))
    merge_delta(spark, table, src, ["id"], when_matched=[])
    back = {r.id: r.v for r in read_delta(spark, table).collect()}
    assert len(back) == 8
    for k in range(5):
        assert back[k] == k * 1.5  # matched rows untouched
    with pytest.raises(KeyError, match="not in table schema"):
        merge_delta(spark, table, src, ["id"],
                    when_matched=[(None, {"update": {"nope": "1"}})])
