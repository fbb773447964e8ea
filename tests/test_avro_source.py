"""avro_source: distributed Avro OCF read/write over avro_lite."""

from __future__ import annotations

import datetime
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_analytics_machine_learning_poc_spark.sources import avro_lite
from big_data_analytics_machine_learning_poc_spark.sources.avro_source import (
    avro_to_parquet,
    avro_to_spark_schema,
    read_avro,
    spark_to_avro_schema,
    write_avro,
)


@pytest.fixture
def outdir():
    path = tempfile.mkdtemp(prefix="avro_src_")
    shutil.rmtree(path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _frame(spark, n=500):
    return spark.range(0, n).select(
        F.col("id"),
        (F.col("id") % 7).cast("int").alias("i"),
        (F.col("id") * 1.5).alias("d"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 30).cast("int")).alias("dt"),
        F.timestamp_seconds(F.col("id") * 3600 + 0.123456).alias("ts"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
        F.struct(F.col("id").alias("x"), F.lit("y").alias("y")).alias("st"),
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("opt"),
    )


def test_roundtrip_all_types(spark, outdir):
    df = _frame(spark)
    summary = write_avro(df, outdir)
    assert sum(s["n_records"] for s in summary) == 500
    assert all(os.path.exists(s["path"]) for s in summary)
    back = read_avro(spark, outdir)  # schema inferred from one file header
    assert back.schema.simpleString() == df.schema.simpleString().replace(
        "id:bigint not null", "id:bigint"
    ) or [f.dataType for f in back.schema.fields] == [
        f.dataType for f in df.schema.fields
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    row = back.filter("id = 5").first()
    assert row.ts.microsecond == 123456  # µs survive the integer coding
    assert row.opt is None and row.m == {"k": 5} and row.st.x == 5


def test_explicit_schema_and_null_codec(spark, outdir):
    df = spark.range(0, 50).select(F.col("id"), F.lit("x").alias("s"))
    write_avro(df, outdir, codec="null")
    back = read_avro(spark, outdir, schema=T.StructType([
        T.StructField("id", T.LongType()), T.StructField("s", T.StringType()),
    ]))
    assert back.count() == 50 and back.agg(F.sum("id")).first()[0] == sum(range(50))


def test_timestamp_ntz_roundtrip(spark, outdir):
    """local-timestamp-micros: a bare-session read of the testdata parquet
    yields TIMESTAMP_NTZ columns, so NTZ must round-trip, not refuse."""
    df = spark.range(0, 40).select(
        F.col("id"),
        F.timestamp_seconds(F.col("id") * 3600 + 0.5).cast("timestamp_ntz").alias("tn"),
    )
    write_avro(df, outdir)
    back = read_avro(spark, outdir)
    assert dict(back.dtypes)["tn"] == "timestamp_ntz"
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    avro = spark_to_avro_schema(df.schema)
    union = avro["fields"][1]["type"]  # nullable → ["null", {...}]
    assert union[1]["logicalType"] == "local-timestamp-micros"


def test_typed_refusals(spark, outdir):
    with pytest.raises(NotImplementedError, match="decimal"):
        spark_to_avro_schema(
            T.StructType([T.StructField("x", T.DecimalType(10, 2))])
        )
    with pytest.raises(NotImplementedError, match="map keys"):
        spark_to_avro_schema(
            T.StructType([T.StructField("m", T.MapType(T.LongType(), T.StringType()))])
        )
    with pytest.raises(FileNotFoundError, match="no .avro files"):
        read_avro(spark, outdir)


def test_empty_frame_writes_no_parts(spark, outdir):
    write_avro(_frame(spark).filter("id < 0"), outdir)
    assert os.path.exists(os.path.join(outdir, "_schema.avsc"))
    assert not [f for f in os.listdir(outdir) if f.endswith(".avro")]


def test_avro_to_spark_schema_enum_fixed_union():
    avro = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "F", "size": 8}},
            {"name": "u", "type": ["null", "long"]},
            {"name": "ms", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        ],
    }
    s = avro_to_spark_schema(avro)
    assert [f.dataType.simpleString() for f in s.fields] == [
        "string", "binary", "bigint", "timestamp",
    ]
    assert [f.nullable for f in s.fields] == [False, False, True, False]
    with pytest.raises(NotImplementedError, match="union"):
        avro_to_spark_schema(
            {"type": "record", "name": "t2",
             "fields": [{"name": "u", "type": ["string", "long"]}]}
        )


def test_reads_foreign_written_file(spark, outdir):
    """A file written directly through avro_lite (not write_avro) —
    timestamp-millis + enum — reads through the same path."""
    schema = {
        "type": "record",
        "name": "evt",
        "fields": [
            {"name": "who", "type": {"type": "enum", "name": "W", "symbols": ["x", "y"]}},
            {"name": "at", "type": {"type": "long", "logicalType": "timestamp-millis"}},
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        ],
    }
    os.makedirs(outdir)
    avro_lite.write_ocf(
        os.path.join(outdir, "f.avro"),
        schema,
        [{"who": "x", "at": 86_400_000, "day": 19_723}],
    )
    row = read_avro(spark, outdir).first()
    assert row.who == "x"
    assert row.at == datetime.datetime(1970, 1, 2, 0, 0)
    assert row.day == datetime.date(1970, 1, 1) + datetime.timedelta(days=19_723)


def test_avro_to_parquet(spark, outdir):
    df = _frame(spark, 100)
    write_avro(df, outdir + "/drop")
    n = avro_to_parquet(spark, outdir + "/drop", outdir + "/landed")
    assert n == 100
    assert spark.read.parquet(outdir + "/landed").agg(F.sum("id")).first()[0] == sum(
        range(100)
    )


def test_explicit_schema_null_fills_missing_column(spark, outdir):
    """Regression (r9 review): reading a directory where older files lack a
    newer column must null-fill, not KeyError inside the Arrow worker."""
    old = spark.range(0, 10).select(F.col("id"))
    write_avro(old, outdir)
    evolved = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("tag", T.StringType())]
    )
    back = read_avro(spark, outdir, schema=evolved)
    assert back.count() == 10
    assert back.filter("tag IS NULL").count() == 10
    # and a mixed directory: new files carry the column, old ones null-fill
    write_avro(
        spark.range(10, 15).select(F.col("id"), F.lit("new").alias("tag")), outdir
    )
    mixed = read_avro(spark, outdir, schema=evolved)
    assert mixed.count() == 15 and mixed.filter("tag = 'new'").count() == 5
