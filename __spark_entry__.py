"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 5-way star join at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (+ the BASELINE.json extension operators) for the DuckDB
differential gate. Registries live next to the operator implementations in
``big_data_analytics_machine_learning_poc_spark/operators/*`` so the Spark query and its oracle
SQL cannot drift apart.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_analytics_machine_learning_poc_spark.registry import QueryRegistry

# The driver records CORRECTNESS rows for (at most) the first 50 registry
# entries per round; rows are cumulative across rounds. Round 1 verified the
# relational block, round 2 the dedup/similarity/encoding/multimodal/ML/
# streaming block (41 of 50 clean; the 9 red rows are fixed this round and
# re-checked below). Queries NOT in this tuple follow in their module
# registration order (their earlier green rows stand).
#
# ROUND-4 WINDOW = the 11 round-3 hash-red rows (root cause: uncast integer
# SUM in the ORACLE SQL — DuckDB widens to HUGEINT, which the driver's
# hasher normalizes differently from Spark's int64; fixed by CAST(... AS
# BIGINT) on all 12 affected columns, guarded by tests/test_oracle_types.py)
# listed FIRST so the fix is OBSERVED green, + ALL 26 never-driver-checked
# queries (computed from CORRECTNESS_r01..r03 keys vs the registry): the
# 17 remaining adapted TPC-H, the r1-overflow window/scalar/percentile
# lanes, obs_ingest_metrics (oracle pre-fixed, same HUGEINT mine), and the
# 4 rows-only ml_* end-to-ends (ml_reference_spam already has its r2 row,
# so it is correctly absent). That completes hard driver signal for the
# entire 166-query registry. The remaining 13 slots re-confirm lanes whose
# source or siblings changed this round (streaming suite next to its edited
# oracles, the r3 posexplode rewrites, the MLlib lane that gains an
# empty-shingle guard) plus the bench headliners.
_DRIVER_WINDOW = (
    # round-3 hash-red rows, oracle-side CAST fix this round
    "sessionize_events",
    "stream_sliding_counts",
    "stream_stateful_user_totals",
    "dedup_pipeline_survivors",
    "corpus_pack_sequences",
    "corpus_e2e_prep",
    "corpus_quality_filter",
    "corpus_mix_sources",
    "corpus_repetition_filter",
    "corpus_contamination_check",
    "emb_centroid_outliers",
    # never-checked: r1-overflow relational/window lanes
    "window_range_moving_avg",
    "window_ntile_family",
    "group_percentiles",
    "scalar_map_funcs",
    # never-checked: remaining adapted TPC-H (q2/q21 were green r3)
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_ship_delay_buckets",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive_predicates",
    "tpch_q20_potential_promotion",
    "tpch_q22_global_sales_opportunity",
    # never-checked: observe-based ingest accounting (oracle pre-fixed)
    "obs_ingest_metrics",
    # never-checked: rows-only ML end-to-ends (driver records rows>0)
    "ml_kmeans_clusters",
    "ml_reference_correlator",
    "ml_reference_random_forest",
    "ml_reference_tfidf",
    # re-confirm: streaming suite beside its edited sibling oracles
    "stream_tumbling_counts",
    "stream_session_windows",
    "stream_stream_join",
    # re-confirm: r3 posexplode rewrites + MLlib empty-shingle guard
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "dedup_embedding_cosine",
    "dedup_connected_components",
    "dedup_mllib_minhash_lsh",
    # NEW this round: jar-free Delta lane end-to-end (commit atomicity,
    # append, time travel, log-stats consistency) — takes the agg_avg_max
    # re-confirm slot (green r1, source untouched since)
    "delta_snapshot_audit",
    # NEW this round: Z-order layout census (same SQL text both engines) —
    # takes the group_filter re-confirm slot (green r1, source untouched)
    "layout_zorder_cells",
    # re-confirm: bench headliner
    "join3_agg",
    # NEW this round (oracle-checked): count-min-sketch watchlist counts +
    # vocabulary OOV audit (text_token_count{,_regex} were green in r1 and
    # are untouched, so these take their re-confirm slots)
    "corpus_cms_heavy_hitters",
    "corpus_vocab_coverage",
)

# ROUND-5 ROTATION PLAN (window above is frozen for the r4 driver run):
# lead with the 25 queries that will still lack a hard driver row after r4
# (computed from CORRECTNESS_r01-r03 keys + this window vs the registry —
# regenerate with the snippet in COVERAGE.md if more lanes land):
# basket_part_pairs, scalar_try_funcs, ann_recall_at_k,
# stream_distinct_users_tumbling, stream_cdc_user_state,
# corpus_stratified_sample_exact, corpus_temperature_mix,
# corpus_temperature_sample_fill, sql_recursive_month_spine,
# sql_session_variables, sql_pipe_syntax, delta_merge_audit,
# agg_bitmap_distinct_users, agg_hll_theta_distinct_audit*,
# agg_kll_value_quantiles*, agg_bitmap_intersection,
# events_cohort_retention, bpe_pair_counts, bpe_learn_merges*,
# bpe_encode_stats*, agg_listagg_median, events_user_ewma,
# events_user_zscore_anomalies, events_user_cusum_alarms,
# dedup_modality_agreement (* = rows-only by design) — then fill with re-confirm
# slots for whatever r5 touches. All 25 pass tools/compare.py (or their
# rows-only contract) and plan lint today.


# ---------------------------------------------------------------------------
# Post-hoc diagnostics for driver-side runs. The round-3 reds proved the
# value of driver-run-written fingerprints (they localized the divergence to
# the driver's HASHER vs DuckDB HUGEINT, exonerating the Spark side in one
# round). Round-4 extension (VERDICT r3 ask #4): dump BOTH sides — ours from
# the Spark result, the oracle's by running the registered SQL through a
# local DuckDB connection inside the driver's own process — so any future
# driver-only red localizes to a side immediately. Best-effort: failures to
# dump never fail a query.
# ---------------------------------------------------------------------------

_DIAG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "DIAG")
# The 11 formerly-red queries + obs_ingest_metrics (same oracle fix, first
# driver check this round): fingerprint both sides at the correctness SF.
_FINGERPRINT_QUERIES = frozenset(
    {
        # r5-pending lanes: their FIRST driver row should carry both-side
        # fingerprints so any red localizes to a side immediately
        "agg_bitmap_distinct_users",
        "agg_bitmap_intersection",
        "events_cohort_retention",
        "events_user_ewma",
        "events_user_zscore_anomalies",
        "events_user_cusum_alarms",
        "bpe_pair_counts",
        "corpus_stratified_sample_exact",
        "corpus_temperature_mix",
        "corpus_temperature_sample_fill",
        "ann_recall_at_k",
        "stream_distinct_users_tumbling",
        "stream_cdc_user_state",
        "sql_recursive_month_spine",
        "sql_session_variables",
        "sql_pipe_syntax",
        "basket_part_pairs",
        "scalar_try_funcs",
        "agg_listagg_median",
        "dedup_modality_agreement",
        "delta_merge_audit",
        # the 11 formerly-red rows + obs_ingest_metrics (r4 window)
        "sessionize_events",
        "stream_sliding_counts",
        "stream_stateful_user_totals",
        "dedup_pipeline_survivors",
        "corpus_pack_sequences",
        "corpus_e2e_prep",
        "corpus_quality_filter",
        "corpus_mix_sources",
        "corpus_repetition_filter",
        "corpus_contamination_check",
        "emb_centroid_outliers",
        "obs_ingest_metrics",
    }
)
_env_dumped = False


def _dump_env(spark: SparkSession, sf_dir: str) -> None:
    global _env_dumped
    if _env_dumped:
        return
    _env_dumped = True
    import json
    import platform

    def conf(key: str) -> str:
        try:
            return str(spark.conf.get(key))
        except Exception:  # noqa: BLE001 — diagnostic only
            return "<unreadable>"

    info = {
        "sf_dir": sf_dir,
        "cwd": os.getcwd(),
        "python": platform.python_version(),
        "spark_version": spark.version,
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "confs": {
            k: conf(k)
            for k in (
                "spark.sql.session.timeZone",
                "spark.sql.ansi.enabled",
                "spark.sql.shuffle.partitions",
                "spark.sql.adaptive.enabled",
                "spark.sql.execution.arrow.pyspark.enabled",
                "spark.sql.legacy.parquet.nanosAsLong",
                "spark.sql.parquet.enableVectorizedReader",
            )
        },
        "env": {
            k: os.environ.get(k)
            for k in ("TZ", "PYTHONHASHSEED", "LANG", "LC_ALL", "SPARK_GRAFT_SF_DIR", "SPARK_GRAFT_CPUS")
        },
        "versions": {},
    }
    for mod in ("pandas", "numpy", "pyarrow", "duckdb"):
        try:
            info["versions"][mod] = __import__(mod).__version__
        except Exception:  # noqa: BLE001
            info["versions"][mod] = None
    os.makedirs(_DIAG_DIR, exist_ok=True)
    with open(os.path.join(_DIAG_DIR, "session_env.json"), "w") as f:
        json.dump(info, f, indent=1, sort_keys=True)


def _dump_fingerprint(name: str, df: DataFrame, sf_dir: str) -> None:
    """Record the order-insensitive value fingerprint (same algorithm the
    local oracle gate uses) plus a small sorted sample of normalized rows —
    for BOTH sides: the Spark result, and the registered oracle SQL run
    through DuckDB inside this same process. A future driver-only red then
    localizes to a side (Spark vs oracle vs the driver's own hasher) from
    the artifact alone."""
    import json

    from big_data_analytics_machine_learning_poc_spark.oracle import (
        fingerprint,
        fingerprint_matrix,
        normalized_matrix,
    )

    rows = [tuple(r) for r in df.collect()]
    cols = df.columns
    mat = normalized_matrix(cols, rows)  # the gate's own canonical form
    payload = {
        "query": name,
        "n_rows": len(rows),
        "cols_sorted": sorted(cols),
        "fingerprint": fingerprint_matrix(mat),
        "rows_head": mat[:5],
        "rows_tail": mat[-5:],
    }
    try:
        import duckdb

        from big_data_analytics_machine_learning_poc_spark.oracle import register_views

        sql = _registry().oracles.get(name)
        if sql is not None:
            from contextlib import closing

            # closing(): a raising oracle (heavy SQL, view issue at the
            # driver's sf_dir) must not leak the native DuckDB instance —
            # 12 fingerprint queries per run in a long-lived driver add up
            with closing(duckdb.connect()) as con:
                register_views(con, sf_dir)
                cur = con.execute(sql)
                dcols = [d[0] for d in cur.description]
                drows = cur.fetchall()
            payload["oracle_n_rows"] = len(drows)
            payload["oracle_cols_sorted"] = sorted(dcols)
            payload["oracle_fingerprint"] = fingerprint(dcols, drows)
            payload["sides_agree"] = payload["oracle_fingerprint"] == payload["fingerprint"]
    except Exception as e:  # noqa: BLE001 — oracle side is advisory
        payload["oracle_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    os.makedirs(_DIAG_DIR, exist_ok=True)
    with open(os.path.join(_DIAG_DIR, f"fp_{name}.json"), "w") as f:
        json.dump(payload, f, indent=1)


def _instrumented(name: str, fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = fn(spark, sf_dir)
        try:
            _dump_env(spark, sf_dir)
            # fingerprints only at the cheap correctness SF (exact basename,
            # not a substring sniff — 'sf10.01' must not trigger it), only
            # for the formerly-red rows (one extra collect + DuckDB run each)
            if name in _FINGERPRINT_QUERIES and os.path.basename(sf_dir.rstrip("/")) == "sf0.01":
                _dump_fingerprint(name, df, sf_dir)
        except Exception:  # noqa: BLE001 — diagnostics must never fail a query
            pass
        return df

    run.__name__ = getattr(fn, "__name__", name)
    run.__doc__ = fn.__doc__
    return run


def _registry() -> QueryRegistry:
    from big_data_analytics_machine_learning_poc_spark.operators import relational

    reg = QueryRegistry()
    reg.merge(relational.REG)
    for mod_name in (
        "text",
        "dedup",
        "similarity",
        "encoding",
        "multimodal",
        "mlops",
        "streaming_ops",
        "asof",
        "skew",
        "corpus",
        "sqlfront",
        "tpch",
        "pandas_api",
        "quality",
        "sketches",
        "bpe",
    ):
        try:
            mod = __import__(
                f"big_data_analytics_machine_learning_poc_spark.operators.{mod_name}",
                fromlist=[mod_name],
            )
        except ModuleNotFoundError as e:
            # tolerate only THIS module being absent (round-incremental
            # scaffolding); a transitive import failure inside an existing
            # module must be LOUD — swallowing it would silently drop all
            # its queries from the driver registry
            if e.name and e.name.endswith(mod_name):
                continue
            raise
        reg.merge(mod.REG)

    missing = [n for n in _DRIVER_WINDOW if n not in reg.queries]
    if missing:
        raise KeyError(f"_DRIVER_WINDOW names not registered: {missing}")
    ordered = list(_DRIVER_WINDOW) + [n for n in reg.queries if n not in set(_DRIVER_WINDOW)]
    reg.queries = {n: reg.queries[n] for n in ordered}
    reg.oracles = {n: reg.oracles[n] for n in ordered if n in reg.oracles}
    return reg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from big_data_analytics_machine_learning_poc_spark.operators.relational import (
        flagship_regional_revenue,
    )

    return flagship_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: _instrumented(n, fn) for n, fn in _registry().queries.items()}


def oracle_sql() -> dict[str, str]:
    return dict(_registry().oracles)
