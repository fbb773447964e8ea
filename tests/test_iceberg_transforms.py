"""Hidden partitioning (spec §Partition Transforms, VERDICT r10 ask #1):
transform parsing, the Appendix B bucket hash against the spec's published
test vectors, write-side derivation, planning-time pruning through each
transform, and DML/compaction on transform-partitioned tables.
"""

from __future__ import annotations

import datetime
import os
import shutil
import struct
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.sources import iceberg_lite
from big_data_analytics_machine_learning_poc_spark.sources.iceberg_lite import (
    _murmur3_32,
    _murmur3_32_long_np,
    _parse_partition_term,
    _partition_field_name,
    _transform_result_type,
    _transform_value,
    plan_scan,
    read_iceberg,
    write_iceberg,
)


@pytest.fixture
def table():
    path = tempfile.mkdtemp(prefix="ice_tx_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _events(spark, n=720):
    # hourly rows from 2024-01-01T00Z; 720 rows = 30 days
    return spark.range(0, n).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 3600).alias("ts"),
        F.concat(F.lit("u"), (F.col("id") % 7)).alias("user"),
        (F.col("id") * 1.5).alias("v"),
    )


# ---------------------------------------------------------------------------
# pure helpers
# ---------------------------------------------------------------------------


def test_murmur3_spec_vectors():
    """The spec's Appendix B publishes hash test vectors; both the scalar
    and the vectorized numpy implementation must match them exactly —
    bucket interop with real Iceberg readers depends on it."""
    import numpy as np

    assert _murmur3_32(struct.pack("<q", 34)) == 2017239379  # int & long 34
    assert _murmur3_32(b"iceberg") == 1210000089
    d = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert _murmur3_32(struct.pack("<q", d)) == -653330422
    ts = int(
        datetime.datetime(
            2017, 11, 16, 22, 31, 8, tzinfo=datetime.timezone.utc
        ).timestamp()
        * 1_000_000
    )
    assert _murmur3_32(struct.pack("<q", ts)) == -2047944441
    got = _murmur3_32_long_np(np.array([34, d, ts], dtype=np.int64))
    assert list(got) == [2017239379, -653330422, -2047944441]


def test_parse_partition_terms():
    assert _parse_partition_term("c_mktsegment") == ("identity", "c_mktsegment")
    assert _parse_partition_term("days(ts)") == ("day", "ts")
    assert _parse_partition_term("DATE(ts)") == ("day", "ts")
    assert _parse_partition_term("hours(ts)") == ("hour", "ts")
    assert _parse_partition_term("months(ts)") == ("month", "ts")
    assert _parse_partition_term("years(ts)") == ("year", "ts")
    assert _parse_partition_term("bucket(16, id)") == ("bucket[16]", "id")
    assert _parse_partition_term("truncate(4, s)") == ("truncate[4]", "s")
    with pytest.raises(NotImplementedError, match="unsupported"):
        _parse_partition_term("void(ts)")
    with pytest.raises(ValueError, match="positive"):
        _parse_partition_term("bucket(0, id)")
    assert _partition_field_name("day", "ts") == "ts_day"
    assert _partition_field_name("bucket[8]", "id") == "id_bucket"
    assert _partition_field_name("truncate[2]", "s") == "s_trunc"


def test_result_types_and_driver_transform():
    assert _transform_result_type("day", "timestamptz") == "date"
    assert _transform_result_type("hour", "timestamp") == "int"
    assert _transform_result_type("bucket[8]", "string") == "int"
    assert _transform_result_type("truncate[4]", "long") == "long"
    with pytest.raises(NotImplementedError):
        _transform_result_type("hour", "date")  # spec: hour needs a timestamp
    with pytest.raises(NotImplementedError):
        _transform_result_type("truncate[4]", "double")
    # driver-side values used for pruning
    assert _transform_value("year", "2024-03-05T10:00:00") == 54
    assert _transform_value("month", "2024-03-05") == (54 * 12) + 2
    assert _transform_value("day", "2024-03-05T23:59:59") == datetime.date(
        2024, 3, 5
    )
    assert _transform_value("hour", "1970-01-02T03:00:00") == 27
    assert _transform_value("truncate[10]", -7) == -10  # floors toward -inf
    assert _transform_value("truncate[3]", "abcdef") == "abc"
    assert _transform_value("bucket[8]", 5) is None  # not order-preserving


# ---------------------------------------------------------------------------
# days(ts): the flagship events layout
# ---------------------------------------------------------------------------


def test_days_layout_prunes_time_range(spark, table):
    write_iceberg(
        _events(spark).repartition(F.to_date("ts")),
        table,
        partition_cols=["days(ts)"],
    )
    plan_all = plan_scan(table)
    # hidden partitioning: the data files carry ts itself; the dirs carry
    # the derived day
    assert plan_all["partition_cols"] == ["ts_day"]
    assert all("ts_day=" in f for f in plan_all["files"])
    back = read_iceberg(spark, table)
    assert back.columns == ["id", "ts", "user", "v"]
    assert back.count() == 720
    # a 3-of-30-day range keeps ~1/10 of the files, at planning time
    plan = plan_scan(
        table, scan_filter=("ts", "2024-01-05 00:00:00", "2024-01-07 23:59:59")
    )
    assert 0 < len(plan["files"]) <= plan_all["files_total_in_read"] * 2 // 10
    got = read_iceberg(
        spark, table, scan_filter=("ts", "2024-01-05 00:00:00", "2024-01-07 23:59:59")
    ).filter("ts >= '2024-01-05' and ts < '2024-01-08'")
    assert got.count() == 72  # 3 days x 24 hourly rows
    # manifest-level pruning engages too (field summaries)
    assert plan["manifests_read"] <= plan["manifests_total"]


def test_identity_date_partition_string_bounds_prune(spark, table):
    """VERDICT r11 #3 (reproduced crash): string scan_filter bounds on an
    IDENTITY date partition must coerce to ``datetime.date`` before the
    summary/partition-tuple comparisons — the pre-r11 behavior restored by
    ``_coerce_bound`` — and actually prune, not raise TypeError."""
    df = spark.range(0, 30).select(
        F.col("id"),
        F.date_add(F.lit(datetime.date(2024, 1, 1)), F.col("id").cast("int")).alias("d"),
        (F.col("id") * 1.5).alias("v"),
    )
    write_iceberg(df.repartition("d"), table, partition_cols=["d"])
    plan_all = plan_scan(table)
    plan = plan_scan(table, scan_filter=("d", "2024-01-05", "2024-01-07"))
    assert 0 < len(plan["files"]) < plan_all["files_total_in_read"]
    got = read_iceberg(spark, table, scan_filter=("d", "2024-01-05", "2024-01-07"))
    assert sorted(r.id for r in got.collect()) == [4, 5, 6]
    # date-typed bounds keep working identically
    plan_typed = plan_scan(
        table,
        scan_filter=("d", datetime.date(2024, 1, 5), datetime.date(2024, 1, 7)),
    )
    assert sorted(plan_typed["files"]) == sorted(plan["files"])


def test_days_layout_dml_and_compact(spark, table):
    from big_data_analytics_machine_learning_poc_spark.sources.iceberg_lite import (
        compact_iceberg,
        delete_where,
        upsert_by_key,
        update_where,
    )

    write_iceberg(
        _events(spark).repartition(F.to_date("ts")),
        table,
        partition_cols=["days(ts)"],
    )
    delete_where(spark, table, "user = 'u3'")
    n_after_delete = read_iceberg(spark, table).count()
    assert n_after_delete == 720 - 720 // 7 - (1 if 720 % 7 > 3 else 0)
    update_where(spark, table, {"v": "v + 1000"}, "user = 'u0'")
    assert read_iceberg(spark, table).filter("v >= 1000").count() > 0
    # upsert keeps the spec: its new data files land in ts_day dirs
    src = _events(spark, 10).withColumn("user", F.lit("uZ"))
    upsert_by_key(spark, table, src, ["id"])
    plan = plan_scan(table)
    assert all("ts_day=" in f for f in plan["files"])
    n_before_compact = read_iceberg(spark, table).count()
    stats = compact_iceberg(spark, table)
    assert stats["snapshot_id"] is not None
    # compaction round-trips the transform spec: still ts_day-partitioned,
    # same logical rows, debt repaid
    plan2 = plan_scan(table)
    assert all("ts_day=" in f for f in plan2["files"])
    assert not plan2["delete_files"] and not plan2["eq_delete_files"]
    assert read_iceberg(spark, table).count() == n_before_compact
    # pruning still works on the compacted table
    pruned = plan_scan(
        table, scan_filter=("ts", "2024-01-05 00:00:00", "2024-01-05 23:59:59")
    )
    assert len(pruned["files"]) < len(plan2["files"])


def test_hours_and_months_and_years(spark, table):
    write_iceberg(_events(spark, 96), table, partition_cols=["hours(ts)"])
    plan = plan_scan(
        table, scan_filter=("ts", "2024-01-02 00:00:00", "2024-01-02 05:59:59")
    )
    assert 0 < len(plan["files"]) < plan["files_total_in_read"]
    got = read_iceberg(
        spark, table, scan_filter=("ts", "2024-01-02 00:00:00", "2024-01-02 05:59:59")
    ).filter("ts >= '2024-01-02' and ts < '2024-01-02 06:00:00'")
    assert got.count() == 6

    t2 = table + "_m"
    # 30-day hourly span covers one month boundary when shifted: use 90d
    write_iceberg(
        spark.range(0, 90).select(
            F.col("id"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 86400).alias("ts"),
        ),
        t2,
        partition_cols=["months(ts)"],
    )
    plan2 = plan_scan(t2, scan_filter=("ts", "2024-02-01 00:00:00", "2024-02-29 23:59:59"))
    assert 0 < len(plan2["files"]) < plan2["files_total_in_read"]
    assert (
        read_iceberg(spark, t2, scan_filter=("ts", "2024-02-01 00:00:00", "2024-02-29 23:59:59"))
        .filter("ts >= '2024-02-01' and ts < '2024-03-01'")
        .count()
        == 29
    )
    shutil.rmtree(t2, ignore_errors=True)


# ---------------------------------------------------------------------------
# bucket / truncate
# ---------------------------------------------------------------------------


def test_bucket_point_lookup_prunes(spark, table):
    write_iceberg(
        _events(spark, 200).repartition(4), table, partition_cols=["bucket(4, id)"]
    )
    total = plan_scan(table)["files_total_in_read"]
    exp_bucket = (_murmur3_32(struct.pack("<q", 5)) & 0x7FFFFFFF) % 4
    plan = plan_scan(table, scan_filter=("id", 5, 5))
    assert plan["files"] and all(f"id_bucket={exp_bucket}" in f for f in plan["files"])
    assert len(plan["files"]) < total
    got = read_iceberg(spark, table, scan_filter=("id", 5, 5)).filter("id = 5")
    assert got.count() == 1
    # a RANGE on a bucketed column must not prune THROUGH THE HASH (hash
    # order != value order) — file-bounds pruning on id may still engage,
    # so assert correctness, not file counts: every in-range row survives
    got_range = read_iceberg(spark, table, scan_filter=("id", 0, 10)).filter(
        "id between 0 and 10"
    )
    assert got_range.count() == 11


def test_bucket_string_column(spark, table):
    write_iceberg(_events(spark, 100), table, partition_cols=["bucket(4, user)"])
    exp = (_murmur3_32("u3".encode()) & 0x7FFFFFFF) % 4
    plan = plan_scan(table, scan_filter=("user", "u3", "u3"))
    assert plan["files"] and all(f"user_bucket={exp}" in f for f in plan["files"])
    got = read_iceberg(spark, table, scan_filter=("user", "u3", "u3")).filter(
        "user = 'u3'"
    )
    assert got.count() == 100 // 7 + (1 if 100 % 7 > 3 else 0)


def test_truncate_layouts(spark, table):
    # string truncate
    write_iceberg(_events(spark, 70), table, partition_cols=["truncate(1, user)"])
    plan = plan_scan(table, scan_filter=("user", "u0", "u0"))
    assert plan["files"] and all("user_trunc=u" in f for f in plan["files"])
    # negative ints floor toward -inf (spec: v - (((v % W) + W) % W))
    t2 = table + "_n"
    df = spark.range(-50, 50).select(F.col("id"), (F.col("id") * 2).alias("x"))
    write_iceberg(df, t2, partition_cols=["truncate(10, id)"])
    plan2 = plan_scan(t2, scan_filter=("id", -7, -7))
    assert plan2["files"] and all("id_trunc=-10" in f for f in plan2["files"])
    assert read_iceberg(spark, t2, scan_filter=("id", -7, -7)).filter(
        "id = -7"
    ).count() == 1
    assert read_iceberg(spark, t2).count() == 100
    shutil.rmtree(t2, ignore_errors=True)


# ---------------------------------------------------------------------------
# spec lifecycle
# ---------------------------------------------------------------------------


def test_append_adopts_transform_spec(spark, table):
    write_iceberg(_events(spark, 48), table, partition_cols=["days(ts)"])
    # bare append adopts the spec; explicit matching terms are accepted
    write_iceberg(_events(spark, 24), table, mode="append")
    write_iceberg(_events(spark, 24), table, mode="append", partition_cols=["days(ts)"])
    # mismatched terms refuse
    with pytest.raises(ValueError, match="partition spec"):
        write_iceberg(
            _events(spark, 24), table, mode="append", partition_cols=["hours(ts)"]
        )
    plan = plan_scan(table)
    assert all("ts_day=" in f for f in plan["files"])
    assert read_iceberg(spark, table).count() == 96


def test_null_source_values(spark, table):
    df = spark.range(0, 20).select(
        F.col("id"),
        F.when(
            F.col("id") < 5, F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 86400)
        ).alias("ts"),
    )
    write_iceberg(df, table, partition_cols=["days(ts)"])
    assert read_iceberg(spark, table).count() == 20
    assert read_iceberg(spark, table).filter("ts is null").count() == 15
    # a range prune drops the null-day files (NULL fails every bound)
    plan = plan_scan(
        table, scan_filter=("ts", "2024-01-01 00:00:00", "2024-01-02 23:59:59")
    )
    assert all("__HIVE_DEFAULT_PARTITION__" not in f for f in plan["files"])
    got = read_iceberg(
        spark, table, scan_filter=("ts", "2024-01-01 00:00:00", "2024-01-02 23:59:59")
    ).filter("ts >= '2024-01-01' and ts < '2024-01-03'")
    assert got.count() == 2


def test_time_travel_across_spec_change(spark, table):
    """An overwrite that re-lays a table from identity to days(ts) gets a
    new spec-id; time travel to the identity snapshot still resolves its
    own spec's dirs."""
    df = _events(spark, 48)
    v1 = write_iceberg(df.withColumn("d", F.to_date("ts")), table,
                       partition_cols=["d"])
    meta1 = iceberg_lite.load_metadata(table)
    write_iceberg(
        df.withColumn("d", F.to_date("ts")), table, mode="overwrite",
        partition_cols=["days(ts)"],
    )
    meta2 = iceberg_lite.load_metadata(table)
    assert meta2["default-spec-id"] != meta1["default-spec-id"]
    assert read_iceberg(spark, table).count() == 48
    old = read_iceberg(spark, table, snapshot_id=v1)
    assert old.count() == 48
    assert all("d=" in f for f in plan_scan(table, snapshot_id=v1)["files"])
    assert all("ts_day=" in f for f in plan_scan(table)["files"])
