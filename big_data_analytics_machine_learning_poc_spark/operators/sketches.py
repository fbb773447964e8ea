"""Mergeable-sketch aggregation lanes: the cardinality / quantile answers a
100 TB pipeline needs WITHOUT shuffling raw rows (no reference counterpart —
extension surface next to operators/corpus.py's count-min lane).

Three families, three verification postures:

- **bitmap** (`bitmap_construct_agg` family, Spark 4): EXACT distinct counts
  through a two-level aggregation whose shuffled state is fixed-size RLE
  bitmaps (32 768 ids per bucket → ≤ 4 KiB per (group, bucket)) instead of
  the expand-shuffle a `COUNT(DISTINCT)` plans. Exact ⇒ full DuckDB oracle.
- **Datasketches HLL / theta** (`hll_sketch_agg`, `theta_sketch_agg`):
  constant-size (~KB) mergeable estimators. Estimates are
  implementation-defined, so the query ships BOTH the estimate and the exact
  count and the pytest gate bounds the relative error; the driver records a
  rows-only row (documented non-SQL-expressible posture, SURVEY §7).
- **Datasketches KLL** (`kll_sketch_agg_double`): mergeable rank/quantile
  sketch with a priori rank-error bounds; same audit posture — exact
  percentiles computed alongside, pytest bounds the rank error.

Why this matters at scale: `COUNT(DISTINCT x)` and exact `percentile(x)`
both force a shuffle whose width is the DATA's cardinality (every distinct
value, or every row, crosses the wire). Every lane here shuffles
CONSTANT-size state per group per map task — the 100 TB cost is one scan
plus a sketch-merge tree, and the sketches are storable/mergeable across
days (incremental rollups fold yesterday's sketch with today's, no
reprocess). The bitmap lane keeps that shape while staying exact, because
the id space is range-partitioned into buckets and each bucket's bitmap is
bounded no matter how many rows hit it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.sketch import bitmap_distinct_count, bitmap_level1, fold_bitmap_counts
from ..registry import QueryRegistry

REG = QueryRegistry()

# Spark's bitmap_bucket_number: 1-based bucket of 32 768 ids —
# floor((v - 1) / 32768) + 1 for positive v. The lane only needs the pair
# (bucket_number, bit_position) to be a bijection of the id, which the
# DuckDB oracle does not reproduce (it just counts distinct ids exactly).
_BITMAP_IDS_PER_BUCKET = 32_768


@REG.add(
    "agg_bitmap_distinct_users",
    sql="""
    SELECT event_type,
           CAST(ts AS DATE) AS day,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
    ORDER BY event_type, day
    """,
)
def agg_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily distinct users per event type via Spark 4 bitmap
    aggregates — `COUNT(DISTINCT)` semantics without its expand-shuffle.

    Plan shape: level 1 groups by (event_type, day, bucket_number(user_id))
    and `bitmap_construct_agg`s the bit positions — partial aggregation
    collapses each task's contribution to one ≤ 4 KiB bitmap per (group,
    32 768-id bucket) BEFORE the shuffle, so shuffle bytes scale with
    |id-space| / 32 768 per group, not with row count. Level 2 sums
    `bitmap_count` per (event_type, day): the second shuffle's input is
    already one row per (group, bucket). Compare `COUNT(DISTINCT user_id)`,
    which plans Expand + a shuffle keyed on (group, user_id) — every
    distinct (group, user) pair crosses the wire. The bitmaps are also
    mergeable state: persisting level 1 gives an incremental daily rollup
    (union tomorrow's bitmaps with `bitmap_or_agg`, never rescan).

    The oracle is plain COUNT(DISTINCT) — the lane is exact, so this is a
    full value-hash check, not an estimate-tolerance check.
    """
    ev = load_table(spark, sf_dir, "events")
    level1 = bitmap_level1(
        ev.select("event_type", F.to_date("ts").alias("day"), "user_id"),
        ["event_type", "day"],
        extra_aggs=(F.count(F.lit(1)).alias("n_events"),),
    )
    return fold_bitmap_counts(
        level1,
        ["event_type", "day"],
        extra_aggs=(F.sum("n_events").alias("n_events"),),
    ).orderBy("event_type", "day")


# Audited relative-error bound for the HLL/theta lane at default sketch
# configs (lgConfigK=12 / lgNomEntries=12) on the testdata cardinalities
# (~100 users). Asserted by tests/test_sketches.py; production bound at
# these configs is ~1.6% (HLL) / ~3% (theta) at 2^12 state.
SKETCH_REL_ERR_MAX = 0.05


@REG.add("agg_hll_theta_distinct_audit")  # rows-only: estimates are
# Datasketches-implementation-defined values with no DuckDB counterpart;
# the exact columns are pytest-bounded against the estimates instead
# (tests/test_sketches.py::test_hll_theta_estimates_within_bound).
def agg_hll_theta_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ and theta sketch distinct-user estimates per event type, with
    the exact count alongside — the audit query you run once per pipeline
    change to certify the estimators before trusting them on 100 TB.

    Both sketches are constant-size (~KB at lgK=12) and MERGEABLE — the
    partial-aggregation state that crosses the shuffle is one sketch per
    (task, group) regardless of row count, and stored sketches fold across
    days/partitions with `hll_union_agg` (set-union semantics; theta
    additionally supports intersection/difference set algebra at the cost
    of slightly wider error). The exact column uses the bitmap lane's
    two-level shape (see agg_bitmap_distinct_users) so even the audit
    query itself has no expand-shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("hll_estimate"),
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias(
            "theta_estimate_raw"
        ),
    )
    exact = bitmap_distinct_count(ev, ["event_type"], alias="exact_users")
    return (
        sketches.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            "hll_estimate",
            # theta estimate is a double (it can be fractional after
            # sampling kicks in); keep the raw value for the audit
            F.col("theta_estimate_raw").alias("theta_estimate"),
            F.round(
                F.abs(F.col("hll_estimate") - F.col("exact_users"))
                / F.col("exact_users"),
                6,
            ).alias("hll_rel_err"),
        )
        .orderBy("event_type")
    )


# KLL sketch size parameter: k=200 gives ~1.3% one-sided rank error with
# 99% confidence (Datasketches a priori table), independent of n.
_KLL_K = 200
KLL_RANK_ERR_MAX = 0.02
_KLL_QS = (0.5, 0.9, 0.99)


@REG.add("agg_kll_value_quantiles")  # rows-only: KLL outputs are
# sketch-algorithm-defined order statistics (a real element near the target
# rank, not an interpolated value); pytest bounds the RANK error of each
# returned quantile against the exact CDF instead
# (tests/test_sketches.py::test_kll_quantiles_within_rank_error).
def agg_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile-sketch p50/p90/p99 of event value per event type, with
    the exact percentiles alongside — mergeable quantiles for the metrics
    rollup where exact `percentile()` (full sort per group) is unpayable.

    The KLL sketch keeps a logarithmic hierarchy of compactors totalling
    O(k · log(n/k)) items; partial aggregation merges sketches, so the
    shuffle carries ~KB per (task, group) and the merged sketch answers any
    quantile afterwards — one pass for ALL of p50/p90/p99 where exact
    percentile sorts every row per group. Returned quantiles are actual
    data elements within ±1.3% rank error at k=200 (99% confidence),
    which the audit columns make visible.

    Run stability (tools/fpstability.py): the kll_* columns drift
    run-to-run WITHIN the rank-error bound — KLL compaction is randomized
    by design and merge order is task-scheduling-dependent — so this
    lane's fingerprint is tolerance-checked (the rank-error pytest), not
    byte-pinned; the exact_* columns are run-stable.
    """
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value", F.lit(_KLL_K)).alias("sk"),
        F.expr(
            "percentile(value, array({}))".format(",".join(map(str, _KLL_QS)))
        ).alias("exact_qs"),
        F.count(F.lit(1)).alias("n_events"),
    )
    cols = [F.col("event_type"), F.col("n_events")]
    for i, q in enumerate(_KLL_QS):
        tag = f"p{round(q * 100)}"
        cols.append(
            F.kll_sketch_get_quantile_double("sk", F.lit(q)).alias(f"kll_{tag}")
        )
        cols.append(F.round(F.col("exact_qs")[i], 6).alias(f"exact_{tag}"))
    return sk.select(*cols).orderBy("event_type")


_INTERSECT_TYPES = ("view", "purchase")


@REG.add(
    "agg_bitmap_intersection",
    sql=f"""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(DISTINCT user_id) AS n_both
    FROM events e
    WHERE event_type = '{_INTERSECT_TYPES[0]}'
      AND user_id IN (SELECT user_id FROM events
                      WHERE event_type = '{_INTERSECT_TYPES[1]}'
                        AND CAST(ts AS DATE) = CAST(e.ts AS DATE))
    GROUP BY CAST(ts AS DATE)
    ORDER BY day
    """,
)
def agg_bitmap_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-day count of users who did BOTH a view and a purchase —
    distinct-set INTERSECTION via bitmap AND, the funnel-overlap metric.

    A COUNT(DISTINCT) intersection normally plans a self-join on user_id
    (shuffle width = |users who viewed| rows). Here each side collapses to
    per-(day, 32 768-id bucket) bitmaps FIRST (partial aggregation, ≤ 4 KiB
    state each), then `bitmap_and_agg` over the per-type bitmaps inside
    each (day, bucket) — restricted to buckets where BOTH types appear
    (`HAVING count = 2`; an AND over one side alone would pass that side
    through) — and `bitmap_count` sums the survivors. Shuffle bytes scale
    with |id-space|/32 768 per day, independent of event volume; theta
    sketches give the same algebra approximately when even the bitmaps are
    too wide (see agg_hll_theta_distinct_audit).

    The oracle is the plain correlated-IN form — the lane is exact."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_INTERSECT_TYPES)
    )
    per_type = bitmap_level1(
        ev.select(F.to_date("ts").alias("day"), "event_type", "user_id"),
        ["day", "event_type"],
    )
    both = (
        per_type.groupBy("day", "bkt")
        .agg(
            F.bitmap_and_agg("bm").alias("bm_and"),
            F.count(F.lit(1)).alias("n_types"),
        )
        .filter(F.col("n_types") == len(_INTERSECT_TYPES))
    )
    return (
        both.groupBy("day")
        .agg(F.sum(F.bitmap_count("bm_and")).alias("n_both"))
        .filter(F.col("n_both") > 0)
        .orderBy("day")
    )


@REG.add(
    "events_cohort_retention",
    sql="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS DATE) AS day FROM events
    ), first AS (
      SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(e.day - f.cohort_day AS BIGINT) AS offset_days,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM ev e JOIN first f ON f.user_id = e.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, distinct
    active users per (cohort, day offset) — the product-analytics rollup.

    Scale shape: ONE shuffle key does all the heavy work — the first-seen
    aggregation hashes on user_id, and the events⋈first join consumes the
    aggregated side at that exact partitioning (no re-exchange of it; at
    small SF, AQE goes further and broadcasts the aggregate outright —
    observed in the executed plan). The (cohort, offset) distinct count goes
    through the bitmap lane (per-bucket bitmap state, see
    agg_bitmap_distinct_users) instead of COUNT(DISTINCT)'s expand-shuffle
    — with |cohorts| × |offsets| groups the expand would multiply the
    events stream by every grouping set at 100 TB. Exact ⇒ full oracle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = ev.join(first, "user_id").select(
        "cohort_day",
        F.datediff("day", "cohort_day").cast("long").alias("offset_days"),
        "user_id",
    )
    return (
        bitmap_distinct_count(joined, ["cohort_day", "offset_days"])
        .orderBy("cohort_day", "offset_days")
    )


@REG.add(
    "events_wau_rolling_bitmap",
    sql="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT d.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN events e ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
    GROUP BY d.day ORDER BY d.day
    """,
)
def events_wau_rolling_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the executable proof of
    the mergeable-bitmap promise: per-(day, bucket) bitmaps are built
    ONCE from the events (the same <=4 KiB level-1 state every bitmap
    lane shuffles), then OR-folded across each day's trailing 7-day
    window with ``bitmap_or_agg`` as a WINDOW aggregate and counted.
    Nothing re-touches raw events per window: the rollup runs over the
    |days| x |buckets| day-grain bitmap frame, so a year of WAU over
    petabytes of events costs one events pass + a window over ~365 x
    buckets tiny rows. A naive formulation (the oracle's) re-joins every
    event into 7 windows and re-deduplicates each — COUNT(DISTINCT) work
    multiplied by the window width.

    Exactness: bitmaps are exact (no HLL error); the oracle is plain
    COUNT(DISTINCT) over the range join. RANGE frame over day ordinals
    handles date gaps (a missing day contributes nothing but windows
    still span calendar days, not 7 rows)."""
    from ..catalog import load_table
    from ..functions.sketch import bitmap_level1

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    per_day = bitmap_level1(ev, ["day"])  # (day, bkt, bm)
    w = (
        Window.partitionBy("bkt")
        .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    # Seed the full |days| x |buckets| grid with empty bitmaps first: a
    # bucket with activity in a day's trailing window but NOT on the day
    # itself would otherwise have no row to anchor that day's window on,
    # silently undercounting. The grid is day-grain x bucket-grain — tiny.
    days = ev.select("day").distinct()
    buckets = per_day.select("bkt").distinct()
    grid = days.crossJoin(buckets)  # |days| x |buckets| tiny frame
    seeded = grid.join(per_day, ["day", "bkt"], "left").select(
        "day", "bkt", F.coalesce(F.col("bm"), F.lit(bytes(4096))).alias("bm")  # empty 4 KiB bitmap
    )
    rolled = seeded.select(
        "day", "bkt", F.expr("bitmap_or_agg(bm)").over(w).alias("bm7")
    )
    return (
        rolled.groupBy("day")
        .agg(F.sum(F.bitmap_count("bm7")).cast("long").alias("wau"))
        .orderBy("day")
    )
