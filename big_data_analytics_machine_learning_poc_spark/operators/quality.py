"""Data-quality and profiling operators (dbt-test / Great-Expectations-shaped,
re-expressed as declarative Spark plans).

A 100 TB pipeline gates every ingest on mechanical checks — key uniqueness,
referential integrity, accepted ranges, null contracts — and profiles new
tables before anyone queries them. Both are ordinary aggregations here:
no bespoke framework, just plans Catalyst already optimizes, so the checks
run at scan speed and compose with everything else.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.localrows import local_rows_df
from ..registry import QueryRegistry
from ..sources import delta_lite as _delta_lite  # noqa: F401 — module-level so
# tools/rotation.py's import-closure hash flags these lanes when delta_lite changes


REG = QueryRegistry()


@REG.add(
    "dq_checks",
    sql="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_customer_fk',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_quantity_range',
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_price_nonnull',
           CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_unit_interval',
           CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    ORDER BY check_name
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-gate check suite: primary-key uniqueness, referential
    integrity, range and null contracts — one row per check with its
    violation count (0 = pass). Scale shape: the PK check is one
    distinct-agg on the key; the FK check is a left-anti join against the
    key-projected dim (broadcast here, shuffle-or-bloom at scale); the
    range/null checks ride a single conditional-agg scan of the fact —
    adding a check adds a column to that pass, not a new scan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    li = load_table(spark, sf_dir, "lineitem")

    pk = o.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("n_violations")
    ).select(F.lit("orders_pk_unique").alias("check_name"), "n_violations")

    fk = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orders_customer_fk").alias("check_name"), "n_violations")
    )

    li_checks = li.agg(
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).alias("q_range"),
        F.sum(F.when(F.col("l_extendedprice").isNull(), 1).otherwise(0)).alias(
            "p_null"
        ),
        F.sum(
            F.when((F.col("l_discount") < 0.0) | (F.col("l_discount") > 1.0), 1).otherwise(0)
        ).alias("d_unit"),
    )
    li_long = li_checks.selectExpr(
        "stack(3, 'lineitem_quantity_range', q_range, "
        "'lineitem_price_nonnull', p_null, "
        "'lineitem_discount_unit_interval', d_unit) AS (check_name, n_violations)"
    )
    return pk.unionByName(fk).unionByName(li_long).orderBy("check_name")


@REG.add(
    "profile_documents",
    sql="""
    SELECT col_name, n_nulls, n_distinct FROM (
      SELECT 'doc_id' AS col_name,
             CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct
      FROM documents
      UNION ALL
      SELECT 'text',
             CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT text) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'lang',
             CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT lang) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'source',
             CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT source) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'n_chars',
             CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT n_chars) AS BIGINT)
      FROM documents
    ) ORDER BY col_name
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-table profile: per column, null count and distinct cardinality —
    the look-before-you-query pass. Built generically from df.columns, so
    it works on any table. Scale shape: null counts ride ONE conditional-
    agg scan; exact distincts are per-column distinct-aggs (Spark expands
    multi-distinct into an Expand — n_cols × rows — which is the honest
    exact cost; at 100 TB swap approx_count_distinct per column into the
    same single pass, the documented promotion)."""
    docs = load_table(spark, sf_dir, "documents")
    null_aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_{c}")
        for c in docs.columns
    ]
    distinct_aggs = [F.count_distinct(F.col(c)).alias(f"d_{c}") for c in docs.columns]
    one = docs.agg(*null_aggs, *distinct_aggs)
    pairs = ", ".join(f"'{c}', n_{c}, d_{c}" for c in docs.columns)
    return one.selectExpr(
        f"stack({len(docs.columns)}, {pairs}) AS (col_name, n_nulls, n_distinct)"
    ).orderBy("col_name")


@REG.add(
    "obs_ingest_metrics",
    sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM events
    """,
)
def obs_ingest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest accounting via ``df.observe``: the metrics (row count,
    purchase count, exact-cents total, key range) aggregate INSIDE the
    write job itself — zero extra scans, which at 100 TB is the difference
    between free accounting and doubling the ingest cost. The "write" here
    is Spark's built-in noop sink (the action that drives the job); a real
    deployment points the same frame at its parquet/lakehouse sink and
    reads the identical metrics off the Observation. Oracle = the same
    aggregates as a plain second-pass query.

    SESSION ISOLATION (Spark 4.1 footgun, found by the full-sweep gate):
    registering an Observation initializes the session's lazy
    ``observationManager`` field, which is NOT java-serializable. Any
    later-fitted MLlib classification model keeps its ``trainingSummary``
    → SparkSession reference inside the model object, and the model rides
    into RDD task closures on evaluator paths
    (MulticlassClassificationEvaluator.evaluate) — so after an observe on
    the shared session, every such evaluate dies with "Task not
    serializable: ObservationManager". Running the observation on a
    ``spark.newSession()`` (same SparkContext, separate session state)
    keeps the shared session's lazy field uninitialized, which serializes
    as null exactly as before."""
    from pyspark.sql import Observation

    from ..session import ensure_session_defaults

    obs_spark = spark.newSession()
    ensure_session_defaults(obs_spark)  # nanosAsLong + UTC on the new state
    ev = load_table(obs_spark, sf_dir, "events")
    obs = Observation("ingest_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purchases"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    names = ("n_rows", "n_purchases", "value_cents", "min_user", "max_user")
    return local_rows_df(
        spark,
        [tuple(int(m[n]) for n in names)],
        "n_rows long, n_purchases long, value_cents long, "
        "min_user long, max_user long",
    )


def observed_write_metrics(
    df: DataFrame, metric_name: str = "write_metrics"
) -> tuple[DataFrame, "object"]:
    """Attach free accounting metrics to a frame: when the returned frame
    is written/collected, the Observation yields row count, null-key
    count, etc. WITHOUT a second pass over the data (the metrics
    aggregate inside the same job). The ingest-accounting idiom: every
    production write should report what it wrote.

        obs_spark = spark.newSession()          # see SESSION ISOLATION
        ensure_session_defaults(obs_spark)
        df = load_table(obs_spark, sf_dir, name)
        observed, obs = observed_write_metrics(df)
        observed.write.parquet(path)
        obs.get  # {'n_rows': ..., 'n_null_keys': ...}

    SESSION ISOLATION (same Spark 4.1 footgun documented on
    ``obs_ingest_metrics`` above): registering an Observation initializes
    the frame's session's lazy non-serializable ObservationManager, which
    later rides into MLlib evaluator task closures via fitted models'
    trainingSummary → session reference and fails with "Task not
    serializable". Build ``df`` on a ``spark.newSession()`` (as above)
    whenever the surrounding application also fits MLlib models on the
    shared session. This helper observes whatever session the caller's
    frame is bound to — a DataFrame cannot be rebound here."""
    from pyspark.sql import Observation

    first_col = df.columns[0]
    obs = Observation(metric_name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(first_col).isNull(), 1).otherwise(0)).alias(
            "n_null_keys"
        ),
    )
    return observed, obs


@REG.add(
    "delta_snapshot_audit",
    sql="""
    SELECT 0 AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_rows_logged
    FROM documents
    UNION ALL
    SELECT 1,
           CAST((SELECT COUNT(*) FROM documents)
                + SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT),
           CAST((SELECT COUNT(*) FROM documents)
                + SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 2,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    ORDER BY version
    """,
)
def delta_snapshot_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse snapshot audit over the jar-free Delta lane
    (``sources/delta_lite.py``, public Delta log protocol): commit the
    documents table (v0 overwrite, partitioned by lang), append the src0
    slice (v1), overwrite with the English slice (v2), then time-travel
    every version and reconcile the SCANNED row count against the
    LOG-CLAIMED count (sum of per-file ``stats.numRecords``). The oracle is
    the same arithmetic on the source table — v0 = all docs, v1 = all +
    src0, v2 = English only — so a green row proves commit atomicity
    (overwrite removes the whole prior snapshot in one commit), append
    semantics, time travel, AND log-stats consistency end-to-end.

    Scale shape: each version read is an explicit file list from the log
    (never a directory LIST), counts are metadata-cheap column-pruned
    scans, and the audit frame itself is 3 rows. At 100 TB the identical
    audit reads ONLY the log for ``n_rows_logged`` — the scan column is
    the (sampled or full) verification pass a table-health job schedules.
    """
    import shutil
    import tempfile

    from ..sources.delta_lite import read_delta, snapshot_summary, write_delta
    from ..sources.lakehouse import union_audit

    # repartition by the partition column first: one file per lang per
    # commit instead of (input partitions × langs) tiny files — the same
    # small-file discipline a 100 TB ingest applies before any
    # dynamic-partition write.
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .repartition("lang")
    )
    table = tempfile.mkdtemp(prefix="delta_audit_")
    try:
        write_delta(docs, table, mode="overwrite", partition_cols=["lang"])
        write_delta(docs.filter(F.col("source") == "src0"), table, mode="append")
        write_delta(docs.filter(F.col("lang") == "en"), table, mode="overwrite")
        # the three version scans as ONE job (union_audit, r13); the
        # log-claimed counts are driver-side metadata, attached as literals
        return union_audit(
            [
                read_delta(spark, table, version=version)
                .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
                .select(
                    F.lit(version).cast("int").alias("version"),
                    "n_rows",
                    F.lit(snapshot_summary(table, version=version)["n_records"])
                    .cast("long")
                    .alias("n_rows_logged"),
                )
                for version in (0, 1, 2)
            ],
            "delta_snapshot_audit",
        )
    finally:
        shutil.rmtree(table, ignore_errors=True)


@REG.add(
    "delta_merge_audit",
    sql="""
    SELECT 0 AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_custkey,
           CAST(0 AS BIGINT) AS n_merged
    FROM customer
    UNION ALL
    SELECT 1,
           CAST(SUM(CASE WHEN c_custkey % 10 <> 3 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN c_custkey % 10 <> 3 THEN c_custkey ELSE 0 END)
                AS BIGINT),
           CAST(0 AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 2,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(c_custkey) AS BIGINT),
           CAST(SUM(CASE WHEN c_custkey % 10 = 4 THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer
    ORDER BY version
    """,
)
def delta_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level lakehouse ops end-to-end under the oracle gate: load
    customer into a Delta table (v0), copy-on-write DELETE the keys with
    ``c_custkey % 10 = 3`` (v1), then MERGE back a change set that UPDATES
    the ``% 10 = 4`` rows (segment → 'MERGED', same keys, so the key-sum is
    invariant) and re-INSERTS the deleted ``% 10 = 3`` rows (v2). Every
    version is time-traveled and audited on (row count, key sum, merged
    count) — integer-exact arithmetic the oracle reproduces from the source
    table alone: v2's count and key-sum equal the ORIGINAL table's because
    the merge restores exactly what the delete removed and updates replace
    their own keys.

    Scale shape mirrors production CDC: the delete rewrites only the files
    holding matched keys (see SCALE.md §Lakehouse for measured locality),
    the merge's match probe is a semi join on the key set, and each audit
    read is an explicit log-derived file list."""
    import shutil
    import tempfile

    from ..sources.delta_lite import delete_where, merge_delta, read_delta, write_delta
    from ..sources.lakehouse import union_audit

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    table = tempfile.mkdtemp(prefix="delta_merge_")
    try:
        # key-ranged layout: the %10 delete touches every file (worst case
        # for locality, best case for exercising the rewrite path)
        write_delta(cust.repartitionByRange(4, "c_custkey"), table)
        delete_where(spark, table, "c_custkey % 10 = 3")
        updates = cust.filter(F.col("c_custkey") % 10 == 4).withColumn(
            "c_mktsegment", F.lit("MERGED")
        )
        reinserts = cust.filter(F.col("c_custkey") % 10 == 3)
        merge_delta(spark, table, updates.unionByName(reinserts), ["c_custkey"])
        # all three version audits as ONE job (union_audit, r13)
        return union_audit(
            [
                read_delta(spark, table, version=version)
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.coalesce(F.sum("c_custkey"), F.lit(0))
                    .cast("long")
                    .alias("sum_custkey"),
                    F.coalesce(
                        F.sum((F.col("c_mktsegment") == "MERGED").cast("long")),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("n_merged"),
                )
                .select(
                    F.lit(version).cast("int").alias("version"),
                    "n_rows",
                    "sum_custkey",
                    "n_merged",
                )
                for version in (0, 1, 2)
            ],
            "delta_merge_audit",
        )
    finally:
        shutil.rmtree(table, ignore_errors=True)


@REG.add(
    "delta_incremental_agg",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def delta_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance over the lakehouse: a per-priority
    (COUNT, SUM-cents) aggregate table is MAINTAINED as orders arrive in
    three commits — each step computes the new batch's partial aggregate
    and folds it into the stored aggregate (union + re-aggregate on the
    ≤|groups|-row state), never re-reading earlier raw data. The oracle is
    the full recompute over all orders: green proves the IVM identity
    fold(partials) == full for the decomposable aggregates (COUNT/SUM),
    which is exactly why production maintains dashboards this way.

    Scale shape: per refresh, cost = one partial agg over the NEW batch
    (map-side combine, shuffle of |groups| rows) + a rewrite of the
    |groups|-row aggregate table. A full recompute re-scans the whole
    history every refresh; at 100 TB with daily increments that is the
    difference between touching ~1/1000 of the data and all of it.
    Non-decomposable aggregates (exact median) need the sketch lane
    (operators/sketches.py KLL) — same fold, mergeable state."""
    import shutil
    import tempfile

    from ..sources.delta_lite import read_delta, write_delta

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    agg_table = tempfile.mkdtemp(prefix="ivm_agg_")

    def partial(batch: DataFrame) -> DataFrame:
        return batch.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
        )

    try:
        for i in range(3):  # three "daily" increments by key residue
            batch = orders.filter(F.col("o_orderkey") % 3 == i)
            inc = partial(batch)
            if i == 0:
                write_delta(inc, agg_table, mode="overwrite")
            else:
                current = read_delta(spark, agg_table)
                folded = (
                    current.unionByName(inc)
                    .groupBy("o_orderpriority")
                    .agg(
                        F.sum("n_orders").alias("n_orders"),
                        F.sum("total_cents").alias("total_cents"),
                    )
                )
                write_delta(folded, agg_table, mode="overwrite")
        from ..streaming.events import spill_to_session_parquet

        out = read_delta(spark, agg_table).orderBy("o_orderpriority")
        # the maintained table dies with the tempdir — spill the ≤5-row
        # result to session scope and hand back the lazy read
        return spill_to_session_parquet(out, "ivm_agg")
    finally:
        shutil.rmtree(agg_table, ignore_errors=True)


@REG.add(
    "pyds_delta_scan",
    sql="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM customer WHERE c_mktsegment = 'BUILDING'
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def pyds_delta_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lakehouse through Spark's first-class connector surface: load
    customer into a delta_lite table partitioned by market segment, then
    read it back with ``spark.read.format("delta_lite")`` — the Python
    Data Source connector (``sources/pyds.py``) — filter one segment, and
    aggregate per nation. The segment filter is PUSHED into the connector
    (spark.sql.python.filterPushdown.enabled), whose planner prunes
    non-matching partition files against the log's partitionValues before
    any task is scheduled: 1 of 5 partition directories is read, the data
    dir is never LISTed, and the oracle proves the pruned scan loses no
    rows. tests/test_sources.py asserts the 5-to-1 partition pruning, the
    zone-map file skipping, and time travel through the same connector."""
    import shutil
    import tempfile

    from ..sources.delta_lite import write_delta
    from ..sources.pyds import DeltaLiteDataSource
    from ..streaming.events import spill_to_session_parquet

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DeltaLiteDataSource)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    table = tempfile.mkdtemp(prefix="pyds_scan_")
    try:
        write_delta(
            cust.repartition("c_mktsegment"), table, partition_cols=["c_mktsegment"]
        )
        out = (
            spark.read.format("delta_lite")
            .load(table)
            .filter(F.col("c_mktsegment") == "BUILDING")
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias(
                    "acctbal_cents"
                ),
            )
            .orderBy("c_nationkey")
        )
        return spill_to_session_parquet(out, "pyds_scan")
    finally:
        shutil.rmtree(table, ignore_errors=True)


@REG.add(
    "delta_change_feed",
    sql="""
    SELECT 'delete' AS change_type,
           CAST(SUM(CASE WHEN c_custkey % 10 = 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rows,
           CAST(SUM(CASE WHEN c_custkey % 10 = 4 THEN c_custkey ELSE 0 END)
                AS BIGINT) AS sum_custkey
    FROM customer
    UNION ALL
    SELECT 'insert',
           CAST(SUM(CASE WHEN c_custkey % 10 IN (3, 4) THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN c_custkey % 10 IN (3, 4) THEN c_custkey ELSE 0 END)
                AS BIGINT)
    FROM customer
    ORDER BY change_type
    """,
)
def delta_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed derived from snapshots (delta_lite.snapshot_diff):
    replay the merge-audit timeline — v0 load, v1 copy-on-write DELETE of
    the %10=3 keys, v2 MERGE that updates the %10=4 rows (segment ->
    'MERGED') and re-inserts the deleted keys — then ask "what NET changed
    between v1 and v2": the updates surface as delete(old)+insert(new),
    the re-inserts as inserts, and every row the rewrite merely copied
    cancels in the multiset difference. The audit aggregates per
    change_type on (count, key-sum), which the oracle reproduces from the
    source table alone: deletes = the %10=4 old images; inserts = the
    %10=4 new images plus the restored %10=3 rows.

    Scale shape: snapshot_diff reads ONLY files present in exactly one
    snapshot — cost follows the change volume, not table size; the
    exceptAll is a shuffle over those changed-file rows alone."""
    import shutil
    import tempfile

    from ..streaming.events import spill_to_session_parquet

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    table = tempfile.mkdtemp(prefix="delta_cdf_")
    try:
        _delta_lite.write_delta(cust.repartitionByRange(4, "c_custkey"), table)
        _delta_lite.delete_where(spark, table, "c_custkey % 10 = 3")
        updates = cust.filter(F.col("c_custkey") % 10 == 4).withColumn(
            "c_mktsegment", F.lit("MERGED")
        )
        reinserts = cust.filter(F.col("c_custkey") % 10 == 3)
        _delta_lite.merge_delta(
            spark, table, updates.unionByName(reinserts), ["c_custkey"]
        )
        out = (
            _delta_lite.snapshot_diff(spark, table, 1, 2)
            .groupBy(F.col("_change_type").alias("change_type"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("c_custkey").cast("long").alias("sum_custkey"),
            )
            .orderBy("change_type")
        )
        return spill_to_session_parquet(out, "delta_cdf")
    finally:
        shutil.rmtree(table, ignore_errors=True)


@REG.add(
    "delta_optimize_audit",
    sql="""
    SELECT 0 AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_custkey
    FROM customer
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT), CAST(SUM(c_custkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(c_custkey) AS BIGINT)
    FROM customer
    ORDER BY version
    """,
)
def delta_optimize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance commits must be metadata-only: load customer across 8
    acctbal-shuffled files (v0), OPTIMIZE ZORDER BY (c_custkey,
    c_nationkey) (v1), then bin-pack compact (v2) — and audit every
    version on (row count, key sum). The oracle states the invariant from
    the source table alone: all three versions carry IDENTICAL content,
    because dataChange=false rewrites reorganize bytes, never rows. The
    unit suite covers the layout consequences (multi-dimension file
    pruning, streaming-reader silence); this lane puts the invariant
    under the driver's differential gate."""
    import shutil
    import tempfile

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    table = tempfile.mkdtemp(prefix="delta_opt_")
    try:
        _delta_lite.write_delta(cust.repartition(8, "c_acctbal"), table)
        _delta_lite.optimize_zorder(spark, table, ["c_custkey", "c_nationkey"], n_files=8)
        _delta_lite.compact_table(spark, table, min_files_per_partition=2)
        from ..sources.lakehouse import union_audit

        # all three version audits as ONE job (union_audit, r13)
        return union_audit(
            [
                _delta_lite.read_delta(spark, table, version=version)
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum("c_custkey").cast("long").alias("sum_custkey"),
                )
                .select(
                    F.lit(version).cast("int").alias("version"),
                    "n_rows",
                    "sum_custkey",
                )
                for version in (0, 1, 2)
            ],
            "delta_opt",
        )
    finally:
        shutil.rmtree(table, ignore_errors=True)


@REG.add(
    "delta_dml_audit",
    sql="""
    SELECT 0 AS version,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_custkey,
           CAST(0 AS BIGINT) AS n_vip
    FROM customer
    UNION ALL
    SELECT 1,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(c_custkey) AS BIGINT),
           CAST(SUM(CASE WHEN c_custkey % 100 = 8 THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT v.version,
           CAST(SUM(CASE WHEN c_custkey % 100 <> 7 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN c_custkey % 100 <> 7 THEN c_custkey ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN c_custkey % 100 = 8 THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer CROSS JOIN (SELECT 2 AS version UNION ALL SELECT 3) v
    GROUP BY v.version
    ORDER BY version
    """,
)
def delta_dml_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 lakehouse DML surface end-to-end under the oracle gate:
    load customer into a Delta table (v0), **update_where** setting
    ``c_mktsegment = 'VIP'`` on the ``% 100 = 8`` key residue (v1 —
    copy-on-write with simultaneous SET semantics), **deletion-vector**
    DELETE of the sparse ``% 100 = 7`` residue (v2 — merge-on-read,
    kilobytes of log, no file rewritten), then **purge_deletion_vectors**
    (v3 — REORG APPLY PURGE, dataChange=false; the UPDATE runs FIRST so
    the DVs are still outstanding when the purge runs). Every version is
    time-traveled and audited on (row count, key sum, VIP count) —
    integer-exact arithmetic the oracle reproduces from the source table
    alone. v3 ≡ v2 is the load-bearing row: physical purge of the DV debt
    changed NOTHING logically, i.e. deleted rows stayed deleted and
    updated rows stayed updated through every representation change
    (inline DV → rewritten file).

    Scale shape: the DV delete commits row indices instead of rewriting
    gigabyte files (the GDPR-erasure shape); the UPDATE rewrites only
    files holding matched rows; purge cost is proportional to remaining
    DV debt, not table size; each audit read is an explicit log-derived
    file list with the DV anti-join applied (sources/delta_lite.py
    `_read_adds`)."""
    import shutil
    import tempfile

    from ..sources.delta_lite import (
        delete_where,
        purge_deletion_vectors,
        read_delta,
        update_where,
        write_delta,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    table = tempfile.mkdtemp(prefix="delta_dml_")
    try:
        write_delta(cust.repartitionByRange(4, "c_custkey"), table)
        update_where(
            spark, table, {"c_mktsegment": "'VIP'"}, "c_custkey % 100 = 8"
        )
        delete_where(spark, table, "c_custkey % 100 = 7", mode="dv")
        if purge_deletion_vectors(spark, table) is None:
            raise RuntimeError(
                "delta_dml_audit expected outstanding deletion vectors at "
                "purge time — the dv-mode delete fell back to copy-on-write"
            )
        from ..sources.lakehouse import union_audit

        # all four version audits as ONE job (union_audit, r13)
        return union_audit(
            [
                read_delta(spark, table, version=version)
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.coalesce(F.sum("c_custkey"), F.lit(0))
                    .cast("long")
                    .alias("sum_custkey"),
                    F.coalesce(
                        F.sum((F.col("c_mktsegment") == "VIP").cast("long")),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("n_vip"),
                )
                .select(
                    F.lit(version).cast("int").alias("version"),
                    "n_rows",
                    "sum_custkey",
                    "n_vip",
                )
                for version in (0, 1, 2, 3)
            ],
            "delta_dml_audit",
        )
    finally:
        shutil.rmtree(table, ignore_errors=True)


@REG.add(
    "pyds_write_roundtrip",
    sql="""
    WITH t AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      WHERE o_orderkey % 2 = 1
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pyds_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The connector WRITE path under the oracle gate: create a delta_lite
    table with ``df.write.format("delta_lite")`` (even-key orders), APPEND
    the odd-key half through the same surface, read the union back through
    ``spark.read.format("delta_lite")``, and aggregate per priority. The
    oracle rebuilds the identical union from the source table, so green
    proves the task-staged-files + one-atomic-log-commit write protocol
    (sources/pyds.py `_DeltaLiteWriterCore`) loses, duplicates, and
    corrupts nothing across create + append.

    Scale shape: each write task stages exactly one parquet file and
    ships only (path, size, footer-stats) to the driver; commit cost is
    O(tasks) metadata, independent of row volume; the read back is the
    log-planned per-file scan every other pyds lane uses."""
    import shutil
    import tempfile

    from ..sources.pyds import DeltaLiteDataSource
    from ..streaming.events import spill_to_session_parquet

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DeltaLiteDataSource)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    table = tempfile.mkdtemp(prefix="pyds_write_") + "/t"
    try:
        even = orders.filter(F.col("o_orderkey") % 2 == 0)
        odd = orders.filter(F.col("o_orderkey") % 2 == 1)
        even.write.format("delta_lite").mode("append").save(table)   # creates
        odd.write.format("delta_lite").mode("append").save(table)    # appends
        out = (
            spark.read.format("delta_lite")
            .load(table)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("o_orderkey").alias("key_sum"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                    "total_cents"
                ),
            )
            .orderBy("o_orderpriority")
        )
        return spill_to_session_parquet(out, "pyds_write_roundtrip")
    finally:
        shutil.rmtree(os.path.dirname(table), ignore_errors=True)
