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
# ROUND-3 WINDOW = the 9 round-2 red rows (fixes must be OBSERVED going
# green) + 41 of the 65 never-checked round-2 additions, chosen to give
# every zero-signal COMPONENT a hard driver row: the SQL front-end lanes,
# the 12 unchecked corpus-prep queries, text extension ops, embedding
# audits, dedup verify extras, the streaming batch twins, UDAF/OLS lanes,
# data-quality/profiling, and the two hardest adapted TPC-H shapes
# (q2 correlated-MIN, q21 double-EXISTS) as plan-audit representatives.
#
# ROUND-4 ROTATION PLAN: the remaining never-checked queries — the other
# 17 adapted TPC-H (tpch_q4/q5/q7-q10/q12-q20/q22 minus the two above),
# text_token_count, text_token_count_regex, obs_ingest_metrics (added r3),
# and the 4 rows-only ml_reference_* end-to-ends — rotate in next; all
# pass tools/compare.py locally today.
_DRIVER_WINDOW = (
    # round-2 red rows, fixed this round (streaming MICROS schema + UTC pin
    # + half-away cents rounding) — listed first so the driver re-checks them
    "sessionize_events",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_stateful_user_totals",
    "stream_stream_join",
    "dedup_pipeline_survivors",
    "corpus_pack_sequences",
    "corpus_e2e_prep",
    # SQL front-end lanes (zero driver signal)
    "sql_tpch_q6_revenue",
    "sql_exists_subquery",
    "sql_not_exists_subquery",
    "sql_in_subquery_chain",
    "sql_scalar_subquery",
    "sql_correlated_scalar_subquery",
    "sql_window_cte",
    "sql_udf_tiered_pricing",
    "sql_parameterized_q6",
    # hardest adapted TPC-H shapes (plan-audit representatives)
    "tpch_q2_min_cost_supplier",
    "tpch_q21_suppliers_who_kept_waiting",
    # corpus prep (12 unchecked)
    "corpus_quality_filter",
    "corpus_mix_sources",
    "corpus_ngram_topk",
    "corpus_repetition_filter",
    "corpus_contamination_check",
    "corpus_hash_sample",
    "corpus_dup_rate_by_source",
    "corpus_length_histogram",
    "corpus_incremental_dedup",
    "corpus_balanced_sample",
    "corpus_pii_redaction",
    "corpus_weighted_sample",
    # text extension ops
    "text_quality",
    "text_stats_arrow",
    "text_udtf_tokens",
    # dedup verify extras
    "dedup_edit_distance_verify",
    "dedup_cluster_size_histogram",
    # embedding audits
    "emb_centroid_outliers",
    "emb_norm_stats",
    "emb_int8_quantization",
    # streaming batch twins + event/JSON shapes
    "stream_dedup_events",
    "timeseries_gap_fill",
    "scd2_user_state",
    "funnel_conversion",
    "variant_shred_events",
    # UDAF / grouped-OLS lanes
    "agg_udaf_geomean",
    "grouped_ols_applyinpandas",
    # data quality + profiling + pandas-API
    "dq_checks",
    "profile_documents",
    "ps_segment_balance",
)


# ---------------------------------------------------------------------------
# Post-hoc diagnostics for driver-side runs. Round 2 left 5 hash-mismatch
# rows that no local configuration (16/32 cores, default-conf driver-mimic,
# non-UTC TZ, full-registry-one-session) reproduces. When the DRIVER invokes
# these queries we capture (a) once per process: the session/env facts a
# divergence could hinge on, (b) for the formerly-red queries at the
# correctness SF: the exact value fingerprint OUR side produced — so a red
# row in CORRECTNESS_r03 becomes attributable (env delta vs compare delta)
# instead of unexplainable. Best-effort: failures to dump never fail a query.
# ---------------------------------------------------------------------------

_DIAG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "DIAG")
_FINGERPRINT_QUERIES = frozenset(
    {
        "dedup_pipeline_survivors",
        "corpus_pack_sequences",
        "corpus_e2e_prep",
        "sessionize_events",
        "stream_stateful_user_totals",
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


def _dump_fingerprint(name: str, df: DataFrame) -> None:
    """Record the order-insensitive value fingerprint (same algorithm the
    local oracle gate uses) plus a small sorted sample of normalized rows."""
    import json

    from big_data_analytics_machine_learning_poc_spark.oracle import fingerprint, norm_cell

    rows = [tuple(r) for r in df.collect()]
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    os.makedirs(_DIAG_DIR, exist_ok=True)
    with open(os.path.join(_DIAG_DIR, f"fp_{name}.json"), "w") as f:
        json.dump(
            {
                "query": name,
                "n_rows": len(rows),
                "cols_sorted": sorted(cols),
                "fingerprint": fingerprint(cols, rows),
                "rows_head": mat[:5],
                "rows_tail": mat[-5:],
            },
            f,
            indent=1,
        )


def _instrumented(name: str, fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = fn(spark, sf_dir)
        try:
            _dump_env(spark, sf_dir)
            # fingerprints only at the cheap correctness SF, only for the
            # round-2 unexplained rows (one extra collect each, ~seconds)
            if name in _FINGERPRINT_QUERIES and sf_dir.rstrip("/").endswith("0.01"):
                _dump_fingerprint(name, df)
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
    ):
        try:
            mod = __import__(
                f"big_data_analytics_machine_learning_poc_spark.operators.{mod_name}",
                fromlist=[mod_name],
            )
            reg.merge(mod.REG)
        except ImportError:
            pass  # module not built yet (round-incremental)

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
