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
# entries per round. Round 1 verified the first 50 (relational + 3 text) —
# all green; this round the remaining 50 queries (dedup / similarity /
# encoding / multimodal / ML / streaming / asof / skew + the new
# dedup_pipeline_survivors) are ordered first so every component has a hard
# driver signal across the two rounds. Queries NOT in this tuple follow in
# their module registration order (they keep their round-1 green rows).
#
# ROUND-3 ROTATION PLAN: after this round, the only queries with no driver
# row are the round-2 additions sitting past position 50 (tpch_q2/q4/q5/
# q7-q22, sql_*, corpus_*, funnel/variant/timeseries/scd2, emb_*, quality,
# pandas_api, window extensions, dedup pipeline extras). Next round, replace
# this tuple with those (they all pass tools/compare.py locally), freeing
# the r1/r2-verified names to follow behind.
_DRIVER_WINDOW = (
    # text extension ops (unchecked in r01; token/quality checked r01)
    "text_lang_id",
    "text_fingerprint",
    "text_readability_pandas_udf",
    "text_rolling_hash",
    # dedup family — the 100 TB north star
    "dedup_exact_stats",
    "dedup_exact_groups",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_keep_first",
    "dedup_pipeline_survivors",
    "dedup_connected_components",
    "dedup_mllib_minhash_lsh",  # rows-only by design (MLlib-internal seeds)
    # similarity search
    "knn_brute_cosine",
    "knn_multi_query",
    "ann_bucket_cosine",
    "ann_ivf_cosine",  # rows-only by design (KMeans centroids)
    "similarity_approx_stats",  # rows-only by design (sketches)
    # feature encoding (F1-F9)
    "array_funcs",
    "bucketize_totalprice",
    "string_index_mktsegment",
    "string_index_apply",
    "tokenizer_tokens",
    "stopwords_remove",
    "vector_assemble_normalize",
    "hashingtf_idf_stats",  # rows-only by design (murmur3 buckets)
    "index_to_string_roundtrip",
    # multimodal
    "mm_decode_features",
    "mm_metadata_stats",
    "mm_resize",
    "mm_frame_sample",  # rows-only by design
    # ML + Arrow UDF lanes. M1/M2 get their driver signal via ml_lr_rmse /
    # ml_rf_confusion; M3 (DecisionTree) only via ml_reference_spam, which
    # therefore stays. The other three ml_reference_* end-to-ends are
    # rows-only AND golden-tested in pytest, so their window slots go to
    # oracle-checked round-2 queries (they rotate into the r3 window).
    "grouped_zscore_applyinpandas",
    "ml_rf_confusion",
    "ml_lr_rmse",
    "ml_reference_spam",
    "corpus_pack_sequences",
    "corpus_split_by_fingerprint",
    "corpus_e2e_prep",
    # streaming (batch-equivalent sessionization first: it has an oracle)
    "sessionize_events",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_stateful_user_totals",
    "stream_stream_join",
    "stream_static_join",
    # as-of join + skew recipes
    "asof_purchase_last_click",
    "skew_salted_agg",
    "skew_salted_join",
)


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
    return dict(_registry().queries)


def oracle_sql() -> dict[str, str]:
    return dict(_registry().oracles)
