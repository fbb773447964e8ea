"""Per-file Bloom-filter data skipping (sources/delta_lite.py).

Zone maps serve range predicates on numerics; Bloom filters serve EQUALITY
on the columns zone maps can't — strings and high-cardinality ids. The
contract under test: zero false NEGATIVES ever (a file containing the value
is never skipped), definite absence prunes files, and the feature is purely
additive (readers ignoring the stats field, rewrites that drop it, and
every existing snapshot operation stay correct).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
    _bloom_build,
    _bloom_may_contain,
    _replay,
    read_delta,
    write_delta,
)


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    table = str(tmp_path_factory.mktemp("bloom") / "t")
    rows = [(i, f"user_{i:04d}", i % 7) for i in range(400)]
    df = spark.createDataFrame(rows, "uid long, name string, grp long")
    # repartitionByRange so each of the 4 files holds a disjoint uid slice
    write_delta(
        df.repartitionByRange(4, "uid"),
        table,
        bloom_columns=["name", "uid"],
    )
    return table


def test_no_false_negatives_for_every_written_value(spark, bloom_table):
    active, _, _ = _replay(bloom_table, None)
    # every file must claim containment for every value it actually holds
    for add in active.values():
        import os

        pdf = spark.read.parquet(os.path.join(bloom_table, add["path"])).collect()
        for r in pdf:
            assert _bloom_may_contain(add, "name", r["name"])
            assert _bloom_may_contain(add, "uid", r["uid"])


def test_definite_absence_prunes_all_files(spark, bloom_table):
    active, _, _ = _replay(bloom_table, None)
    adds = list(active.values())
    assert len(adds) == 4
    # a value never written: deterministic blooms -> stable pruning
    kept = [a for a in adds if _bloom_may_contain(a, "name", "user_9999")]
    assert kept == []
    # read_delta equality_filters path: 0 files -> empty frame, same schema
    out = read_delta(spark, bloom_table, equality_filters={"name": "user_9999"})
    assert out.count() == 0
    assert out.columns == ["uid", "name", "grp"]


def test_present_value_reads_exactly_its_rows(spark, bloom_table):
    out = read_delta(
        spark, bloom_table, equality_filters={"name": "user_0042"}
    ).filter(F.col("name") == "user_0042")
    assert [r["uid"] for r in out.collect()] == [42]
    # int-typed bloom column too (canonicalization int <-> literal)
    out2 = read_delta(spark, bloom_table, equality_filters={"uid": 123}).filter(
        F.col("uid") == 123
    )
    assert [r["name"] for r in out2.collect()] == ["user_0123"]


def test_connector_bloom_pruning_and_correctness(spark, bloom_table):
    from pyspark.sql.datasource import EqualTo

    from big_data_analytics_machine_learning_poc_spark.sources.pyds import (
        DeltaLiteDataSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DeltaLiteDataSource)
    ds = DeltaLiteDataSource(options={"path": bloom_table})
    r = ds.reader(ds.schema())
    assert len(r.partitions()) == 4
    # a present string value lives in exactly one range file
    list(r.pushFilters([EqualTo(("name",), "user_0042")]))
    assert len(r.partitions()) == 1
    # absent value: all files bloom-pruned before task planning
    r2 = ds.reader(ds.schema())
    list(r2.pushFilters([EqualTo(("name",), "user_9999")]))
    assert len(r2.partitions()) == 0
    # end-to-end correctness through Spark (filter re-applied row-level)
    got = (
        spark.read.format("delta_lite")
        .load(bloom_table)
        .filter(F.col("name") == "user_0042")
        .collect()
    )
    assert [r["uid"] for r in got] == [42]


def test_additive_compatibility_and_rewrite_loss_is_safe(spark, tmp_path, bloom_table):
    # snapshot ops that know nothing of blooms behave identically
    assert read_delta(spark, bloom_table).count() == 400
    # a commit WITHOUT bloom_columns appends bloom-less files: equality
    # filters keep them (conservative), rows never lost
    extra = spark.createDataFrame([(9999, "user_9999", 0)], "uid long, name string, grp long")
    write_delta(extra, bloom_table, mode="append")
    out = read_delta(
        spark, bloom_table, equality_filters={"name": "user_9999"}
    ).filter(F.col("name") == "user_9999")
    assert out.count() == 1
    active, _, _ = _replay(bloom_table, None)
    with_bloom = [
        a for a in active.values() if "bloom" in json.loads(a.get("stats") or "{}")
    ]
    assert len(with_bloom) == 4  # originals keep theirs; new file has none


def test_bloom_rejects_float_columns():
    with pytest.raises(TypeError, match="string/int"):
        _bloom_build([1.5], 1024, 4)
