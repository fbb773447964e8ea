"""Structured Streaming tests: windowed aggregations driven to completion
through the memory sink, checked against their batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.catalog import load_table
from big_data_analytics_machine_learning_poc_spark.operators import streaming_ops
from big_data_analytics_machine_learning_poc_spark.streaming import events as sev

from .conftest import SF_DIR


def test_tumbling_counts_total_preserved(spark):
    out = sev.tumbling_counts(spark, SF_DIR, "5 minutes", output_mode="complete")
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == load_table(spark, SF_DIR, "events").count()


def test_sliding_counts_double_count(spark):
    """window=10m slide=5m ⇒ every event appears in exactly 2 windows."""
    out = sev.sliding_counts(
        spark, SF_DIR, "10 minutes", "5 minutes", output_mode="complete"
    )
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == 2 * load_table(spark, SF_DIR, "events").count()


def test_batch_stream_source_single_source_invariant(spark):
    """The round-2 regression class: batch and streaming MUST read events.ts
    identically (they share catalog.normalize_events_ts). Count, min/max
    event time, and exact-cents value sum agree between the two paths."""
    probe = [
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("ts").cast("double")).alias("mn"),
        F.max(F.col("ts").cast("double")).alias("mx"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    ]
    batch = load_table(spark, SF_DIR, "events").agg(*probe).collect()[0]
    streamed = sev.run_to_completion(
        sev.read_event_stream(spark, SF_DIR).select("ts", "value"), "append"
    )
    stream = streamed.agg(*probe).collect()[0]
    assert tuple(batch) == tuple(stream)
    # and the batch side actually reads the 2024 data, not a collapsed epoch
    assert batch.mn > 1.7e9


def test_append_mode_emits_exactly_watermark_closed_windows(spark):
    """The production (append) path must emit precisely the windows the
    10-minute watermark has closed — bounded state, no re-emission — while
    complete mode re-emits everything including still-open windows."""
    complete = {
        (r.window_start_epoch, r.event_type): r.n
        for r in sev.tumbling_counts(
            spark, SF_DIR, "5 minutes", output_mode="complete"
        ).collect()
    }
    append = {
        (r.window_start_epoch, r.event_type): r.n
        for r in sev.tumbling_counts(
            spark, SF_DIR, "5 minutes", output_mode="append"
        ).collect()
    }
    max_us = load_table(spark, SF_DIR, "events").agg(
        F.max(F.expr("unix_micros(ts)"))
    ).collect()[0][0]
    # Spark tracks watermark in ms: max event time − 10 min delay; an append
    # row is emitted iff its window END has passed the watermark
    wm_ms = max_us // 1000 - 600_000
    expected = {
        k: v for k, v in complete.items() if (k[0] + 300) * 1000 <= wm_ms
    }
    assert append == expected
    assert 0 < len(append) < len(complete)  # state was actually evicted


def test_session_window_stream_matches_batch_islands(spark):
    """The stateful streaming session_window must agree exactly with the
    batch lag+cumsum sessionization on bounded input (same 30-min gap)."""
    stream_rows = sorted(
        (r.user_id, r.session_start_epoch, r.n_events)
        for r in streaming_ops.stream_session_windows(spark, SF_DIR).collect()
    )
    batch_rows = sorted(
        (r.user_id, r.session_start_epoch, r.n_events)
        for r in streaming_ops.sessionize_events(spark, SF_DIR).collect()
    )
    assert stream_rows == batch_rows


def test_normalize_events_ts_rejects_unknown_storage(spark):
    """A future testdata generation storing ts as an unsupported type must
    fail loudly at load, not silently coerce into shifted event times."""
    import pytest
    from pyspark.sql import types as T

    from big_data_analytics_machine_learning_poc_spark.catalog import normalize_events_ts

    df = load_table(spark, SF_DIR, "events")
    with pytest.raises(TypeError, match="unsupported type"):
        normalize_events_ts(df, T.StringType())


def test_watermark_present_in_plan(spark):
    """Late-data handling is part of the operator contract: the streaming
    aggregation must carry an event-time watermark."""
    ev = sev.read_event_stream(spark, SF_DIR)
    agg = ev.withWatermark("ts", "10 minutes").groupBy(F.window("ts", "5 minutes")).count()
    assert "EventTimeWatermark" in agg._jdf.queryExecution().logical().toString()


def test_foreachbatch_sink(spark):
    """foreachBatch: the exactly-once custom-sink hook — counts arriving
    per micro-batch must sum to the table total."""
    from big_data_analytics_machine_learning_poc_spark.streaming.events import read_event_stream

    seen: list[int] = []
    ev = read_event_stream(spark, SF_DIR).select("event_id")
    q = (
        ev.writeStream.foreachBatch(lambda df, epoch: seen.append(df.count()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(seen) == load_table(spark, SF_DIR, "events").count()


def test_rocksdb_state_store_equivalent(spark):
    """The same stateful query under the RocksDB state store provider (the
    100 TB state backend: state lives off-heap/on-disk per task instead of
    in executor heap) must produce byte-identical results to the default
    HDFS-backed provider."""
    from big_data_analytics_machine_learning_poc_spark.streaming import events as sev

    def run():
        rows = sev.tumbling_counts(
            spark, SF_DIR, "5 minutes", output_mode="complete"
        ).collect()
        return sorted((r.window_start_epoch, r.event_type, r.n) for r in rows)

    base = run()
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        rocks = run()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert rocks == base


def test_transform_with_state_matches_apply_in_pandas(spark):
    """Where the transformWithState protocol dependency exists, the new API
    must agree with the applyInPandasWithState twin; in this container the
    gate must raise a clear ImportError instead of crashing a query."""
    import pytest

    from big_data_analytics_machine_learning_poc_spark.streaming import stateful

    if not stateful.tws_available():
        with pytest.raises(ImportError, match="protobuf"):
            stateful.tws_user_totals(spark, SF_DIR)
        pytest.skip("google.protobuf not installed in this container")
    a = {
        (r.user_id): (r.n_events, r.total_cents)
        for r in stateful.tws_user_totals(spark, SF_DIR).collect()
    }
    b = {
        (r.user_id): (r.n_events, r.total_cents)
        for r in stateful.running_user_totals(spark, SF_DIR).collect()
    }
    assert a == b


def test_stateful_totals_multi_batch_equals_batch(spark, tmp_path):
    """applyInPandasWithState across REAL multiple micro-batches (3 files,
    maxFilesPerTrigger=1): per-user state must accumulate across batches and
    the final-state reduction must equal the batch aggregation — the
    file-layout-independence contract of running_user_totals."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from big_data_analytics_machine_learning_poc_spark.streaming import stateful

    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 30)
        .select("user_id", "value")
    )
    src = str(tmp_path / "ev")
    ev.repartition(3).write.parquet(src)

    raw = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    updated = raw.groupBy("user_id").applyInPandasWithState(
        stateful._update_user_totals,
        outputStructType=stateful.OUTPUT_SCHEMA,
        stateStructType=stateful.STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = sev.run_to_completion(updated, "update").collect()
    n_users = ev.select("user_id").distinct().count()
    assert len(out) > n_users  # several updates per user → truly multi-batch

    updates = spark.createDataFrame(out)
    last = F.max(F.struct("n_events", "total_cents"))
    got = {
        r.user_id: (r.n_events, r.total_cents)
        for r in updates.groupBy("user_id")
        .agg(
            last.getField("n_events").alias("n_events"),
            last.getField("total_cents").alias("total_cents"),
        )
        .collect()
    }
    want = {
        r.user_id: (r.n, r.c)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    }
    assert got == want


def test_foreachbatch_incremental_state_equals_batch(spark, tmp_path):
    """Streamed micro-batches folded through merge_aggregate_state must
    reproduce the batch aggregate exactly — the streaming→incremental-state
    composition a production ingest runs (foreachBatch as the MERGE driver,
    monoid state, exact cents)."""
    from pyspark.sql import functions as F

    from big_data_analytics_machine_learning_poc_spark.sources.sinks import (
        merge_aggregate_state,
    )
    from big_data_analytics_machine_learning_poc_spark.sources.synthdocs import (
        synth_docs,
        synth_docs_stream,
    )

    state = str(tmp_path / "state")

    def fold(batch_df, batch_id):
        merge_aggregate_state(
            batch_df.sparkSession,
            state,
            batch_df.select("source", F.col("n_chars").alias("chars")),
            ["source"],
            ["chars"],
        )

    q = (
        synth_docs_stream(spark, max_rows=300, rows_per_batch=77, seed=11)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.source: (r.chars, r.n_rows) for r in spark.read.parquet(state).collect()
    }
    want = {
        r.source: (r.s, r.n)
        for r in synth_docs(spark, rows=300, partitions=4, seed=11)
        .groupBy("source")
        .agg(F.sum("n_chars").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stateful_totals_null_value_matches_sql_sum(spark, tmp_path):
    """A NULL events.value must not crash the state worker (int(NaN)) and
    must follow SQL SUM semantics: the row counts in n_events, contributes
    nothing to total_cents — matching the registered oracle's
    COUNT(*) / SUM(ROUND(value*100)) pair."""
    import datetime as dt

    from big_data_analytics_machine_learning_poc_spark.streaming.stateful import (
        running_user_totals,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, "click", 1.25, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 7, "view", None, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 7, "purchase", 2.50, "{}"),
        (4, t0 + dt.timedelta(minutes=3), 8, "click", None, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "staging"))
    import glob
    import shutil

    part = glob.glob(str(tmp_path / "staging" / "part-*.parquet"))[0]
    shutil.copyfile(part, str(tmp_path / "events.parquet"))

    out = running_user_totals(spark, str(tmp_path), max_user=100)
    got = {r.user_id: (r.n_events, r.total_cents) for r in out.collect()}
    assert got == {7: (3, 375), 8: (1, 0)}


def test_streaming_bitmap_distinct_append_consistent_with_batch(spark):
    """Append-mode emitted bitmap state, folded to counts, must equal batch
    COUNT(DISTINCT) for every window it emits (append only withholds
    still-open trailing windows — the rows it DOES emit are final)."""
    from big_data_analytics_machine_learning_poc_spark.catalog import load_table
    from big_data_analytics_machine_learning_poc_spark.streaming import events as sev

    bm = sev.tumbling_distinct_user_bitmaps(spark, SF_DIR, "5 minutes", output_mode="append")
    folded = {
        (r["window_start_epoch"], r["event_type"]): r["n"]
        for r in bm.groupBy("window_start_epoch", "event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("n"))
        .collect()
    }
    assert folded, "append mode emitted nothing"
    batch = {
        (r["w"], r["event_type"]): r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(
            (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("long").alias("w"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for key, n in folded.items():
        assert batch[key] == n, (key, n, batch.get(key))


def test_cdc_upsert_order_independent(spark, tmp_path):
    """apply_cdc_batch's reconcile-then-merge must converge to the same
    final state regardless of batch arrival order (out-of-order replay,
    backfill): three disjoint event slices applied in two different orders
    produce identical tables, equal to last-event-per-user over the union."""
    from big_data_analytics_machine_learning_poc_spark.functions.exact import cents
    from big_data_analytics_machine_learning_poc_spark.operators.streaming_ops import (
        _cdc_latest_per_user,
        apply_cdc_batch,
    )
    from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import read_delta

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type", cents("value").alias("value_cents")
    )
    slices = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    t1, t2 = str(tmp_path / "cdc1"), str(tmp_path / "cdc2")
    for s in slices:
        apply_cdc_batch(s, t1)
    for s in reversed(slices):
        apply_cdc_batch(s, t2)
    key = lambda df: {
        r["user_id"]: (r["event_id"], r["event_type"], r["value_cents"])
        for r in df.collect()
    }
    got1, got2 = key(read_delta(spark, t1)), key(read_delta(spark, t2))
    want = key(_cdc_latest_per_user(ev))
    assert got1 == want
    assert got2 == want


def test_ewma_planted_series(spark):
    """Hand-checked recurrence on a planted series + constant-series
    invariant (EWMA of a constant is that constant) — runs the SHIPPED
    user_ewma core, not an inline copy."""
    from big_data_analytics_machine_learning_poc_spark.operators.streaming_ops import _EWMA_ALPHA, user_ewma

    a = _EWMA_ALPHA
    rows = [(1, i, float(v)) for i, v in enumerate([100, 200, 50, 50])] + [
        (2, i, 70.0) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_id: long, vc: double")
    got = {
        r["user_id"]: r["ewma_cents"]
        for r in user_ewma(df, order_cols=("event_id",)).collect()
    }
    want = 100.0
    for v in (200.0, 50.0, 50.0):
        want = a * v + (1 - a) * want
    assert got[1] == round(want, 6)
    assert got[2] == 70.0


def test_zscore_anomaly_planted(spark):
    """A planted spike in an otherwise calm series must be flagged exactly
    once; the calm series alone yields zero anomalies."""
    from big_data_analytics_machine_learning_poc_spark.operators import streaming_ops as so

    calm = [(1, i, 100 + (i % 3)) for i in range(40)]          # tiny jitter
    spike = [(2, i, 100 + (i % 3)) for i in range(40)]
    spike[30] = (2, 30, 5000)                                   # the outlier
    rows = [
        (u, e, f"2024-01-01 00:{e:02d}:00", float(v))
        for u, e, v in calm + spike
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, event_id: long, ts_s: string, value: double"
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"), "value")
    from big_data_analytics_machine_learning_poc_spark.functions.exact import cents

    c = df.select("user_id", "ts", "event_id", cents("value").alias("vc"))
    # the SHIPPED core, not an inline copy
    got = {
        r["user_id"]: r["n_anomalies"]
        for r in so.user_zscore_anomalies(c).collect()
    }
    assert got[1] == 0
    assert got[2] == 1


def test_zscore_integer_algebra_matches_float_form(spark):
    """On random series, the int64 threshold decision must equal the float
    z-score decision everywhere the float z² isn't within epsilon of the
    threshold (the integer form is exact; the float form is the familiar
    definition)."""
    import random as _random

    from pyspark.sql.window import Window as W

    from big_data_analytics_machine_learning_poc_spark.operators import streaming_ops as so

    rng = _random.Random(5)
    # domain covers the real data (max 56 021 cents at sf0.1) with margin
    rows = [
        (u, i, float(rng.randint(1, 100_000)))
        for u in range(6)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_id: long, vc_f: double")
    c = df.select("user_id", "event_id", F.col("vc_f").cast("long").alias("vc"))
    win = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-(so._Z_WIN - 1), 0)
    w = c.select(
        "user_id", "event_id", "vc",
        F.sum("vc").over(win).alias("s"),
        F.sum(F.col("vc") * F.col("vc")).over(win).alias("sq"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).filter(F.col("n") == so._Z_WIN)
    dev = F.col("n") * F.col("vc") - F.col("s")
    var_n = F.col("n") * F.col("sq") - F.col("s") * F.col("s")
    int_flag = (F.col("n") - 1) * dev * dev > so._Z_THRESH_SQ * F.col("n") * var_n
    # float z² = (v - mean)² / sample_var
    mean = F.col("s").cast("double") / F.col("n")
    svar = (F.col("sq").cast("double") - F.col("n") * mean * mean) / (F.col("n") - 1)
    z2 = (F.col("vc").cast("double") - mean) ** 2 / svar
    out = w.select(int_flag.alias("i"), z2.alias("z2")).collect()
    assert out
    for r in out:
        if abs(r["z2"] - so._Z_THRESH_SQ) > 1e-6:
            assert r["i"] == (r["z2"] > so._Z_THRESH_SQ), r


def test_cusum_window_form_equals_recurrence(spark):
    """The window identity S_i = P_i - min_{j<=i} P_j must equal the
    textbook recurrence S_i = max(0, S_{i-1} + d_i) on random series —
    the exactness claim the CUSUM oracle rests on."""
    import random as _random

    from pyspark.sql.window import Window as W

    rng = _random.Random(17)
    rows = [
        (u, i, rng.randint(-500, 520)) for u in range(4) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_id: long, d: long")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(W.unboundedPreceding, 0)
    p = df.select("user_id", "event_id", "d", F.sum("d").over(w).alias("pfx"))
    s = p.select(
        "user_id",
        "event_id",
        F.greatest(
            F.col("pfx") - F.least(F.min("pfx").over(w), F.lit(0)), F.lit(0)
        ).alias("cusum"),
    )
    got = {
        (r["user_id"], r["event_id"]): r["cusum"] for r in s.collect()
    }
    by_user: dict = {}
    for u, i, d in sorted(rows):
        acc = max(0, by_user.get(u, 0) + d)
        by_user[u] = acc
        assert got[(u, i)] == acc, (u, i, got[(u, i)], acc)


def test_memory_sink_row_ceiling_is_loud(spark, monkeypatch):
    """Bounded-or-spill contract (VERDICT r4 ask #3): a complete/update
    result past STREAM_RESULT_ROW_CEILING must raise a loud RuntimeError
    naming the append-mode escape hatch — never silently OOM the driver."""
    import pytest

    monkeypatch.setattr(sev, "STREAM_RESULT_ROW_CEILING", 1)
    with pytest.raises(RuntimeError, match="memory-sink ceiling"):
        sev.tumbling_counts(spark, SF_DIR, "5 minutes", output_mode="complete")


def test_run_to_completion_returns_lazy_spilled_frame(spark):
    """No path out of run_to_completion may pin rows on the driver: both
    the append file-sink path and the complete memory-sink spill path must
    return a DataFrame backed by parquet files (lazy re-scan), not a
    driver-local createDataFrame."""
    for mode in ("append", "complete"):
        df = sev.tumbling_counts(spark, SF_DIR, "5 minutes", output_mode=mode)
        files = df.inputFiles()
        assert files and all(f.endswith(".parquet") for f in files), (mode, files)


def test_daily_peak_concurrency_planted(spark, tmp_path):
    """Sweep-line correctness on hand-computed intervals: 3 events at
    10:00/10:02/10:04 (5-min spans) overlap pairwise-chained to peak 3;
    an isolated event the next day peaks at 1; a back-to-back pair at
    12:00/12:05 must NOT double-count at the boundary (end sorts before
    start) -> peak 1."""
    import datetime as dt

    from big_data_analytics_machine_learning_poc_spark.operators.streaming_ops import (
        events_daily_peak_concurrency,
    )

    def ev(i, t, u=1):
        return (i, t, u, "click", 1.0, "{}")

    d1 = dt.datetime(2024, 1, 1)
    rows = [
        ev(1, d1.replace(hour=10, minute=0)),
        ev(2, d1.replace(hour=10, minute=2)),
        ev(3, d1.replace(hour=10, minute=4)),
        ev(4, d1.replace(hour=12, minute=0)),
        ev(5, d1.replace(hour=12, minute=5)),
        ev(6, dt.datetime(2024, 1, 2, 9, 0)),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r["day"].isoformat(): (r["peak_concurrency"], r["n_events"])
        for r in events_daily_peak_concurrency(spark, str(tmp_path)).collect()
    }
    assert out == {"2024-01-01": (3, 5), "2024-01-02": (1, 1)}


def test_cumulative_distinct_users_monotone_and_totals(spark):
    """Per type: the running count is strictly increasing, each step adds
    exactly n_new_users, and the final value equals the type's true
    distinct-user count."""
    from big_data_analytics_machine_learning_poc_spark.catalog import load_table
    from big_data_analytics_machine_learning_poc_spark.operators.streaming_ops import (
        events_cumulative_distinct_users,
    )

    from .conftest import SF_DIR

    rows = events_cumulative_distinct_users(spark, SF_DIR).collect()
    truth = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        cum = 0
        for r in rs:  # lane orders by (type, day)
            cum += r["n_new_users"]
            assert r["cum_distinct_users"] == cum
        assert cum == truth[t]


def test_medallion_chain_bronze_to_silver(spark, tmp_path):
    """Bronze->silver medallion chain composed from the engine's own
    parts: raw events land in a bronze delta table across 3 append
    commits; a streaming query tails it via format('delta_lite_stream')
    and foreachBatch-applies the CDC latest-per-user merge into a silver
    delta table. The silver state must equal the batch truth (last event
    per user over all bronze rows) — exactly-once, commit-granular."""
    from big_data_analytics_machine_learning_poc_spark.catalog import load_table
    from big_data_analytics_machine_learning_poc_spark.functions.exact import cents
    from big_data_analytics_machine_learning_poc_spark.operators.streaming_ops import (
        apply_cdc_batch,
    )
    from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
        read_delta,
        write_delta,
    )
    from big_data_analytics_machine_learning_poc_spark.sources.pyds import (
        DeltaLiteStreamDataSource,
    )

    spark.dataSource.register(DeltaLiteStreamDataSource)
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", "ts", "event_id", "event_type",
                cents("value").alias("value_cents"))
    )
    bronze = str(tmp_path / "bronze")
    for i in range(3):
        write_delta(
            ev.filter(F.col("event_id") % 3 == i),
            bronze,
            mode="append" if i else "overwrite",
        )

    silver = str(tmp_path / "silver")
    q = (
        spark.readStream.format("delta_lite_stream")
        .load(bronze)
        .writeStream.foreachBatch(lambda df, _bid: apply_cdc_batch(df, silver))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.user_id: (r.ts, r.event_id, r.event_type, r.value_cents)
        for r in read_delta(spark, silver).collect()
    }
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        r.user_id: (r.ts, r.event_id, r.event_type, r.value_cents)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .collect()
    }
    assert got == want
