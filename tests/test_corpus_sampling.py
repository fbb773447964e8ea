"""Semantic tests for the exact-quota sampling lanes: the properties that
oracle parity alone can't show (exact stratum sizes, partitioning
independence, temperature-allocation invariants)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.operators import corpus

from .conftest import SF_DIR


def test_stratified_sample_exact_quota_per_stratum(spark):
    rows = corpus.corpus_stratified_sample_exact(spark, SF_DIR).collect()
    per_lang = Counter(r["lang"] for r in rows)
    from big_data_analytics_machine_learning_poc_spark.catalog import load_table

    sizes = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, n in sizes.items():
        assert per_lang[lang] == min(corpus._STRAT_K, n), (lang, per_lang)
    # ranks are 1..K within each stratum, no duplicates
    seen = Counter((r["lang"], r["rn"]) for r in rows)
    assert all(v == 1 for v in seen.values())


def test_stratified_sample_partitioning_independent(spark):
    """The sample is a pure function of the data: the same doc_ids must
    survive under a different partitioning of the input (the property
    seeded sample()/randomSplit does NOT have)."""
    base = {
        (r["lang"], r["doc_id"])
        for r in corpus.corpus_stratified_sample_exact(spark, SF_DIR).collect()
    }
    from big_data_analytics_machine_learning_poc_spark.catalog import load_table

    # the SHIPPED lane core on a repartitioned input (not an inline copy)
    docs = load_table(spark, SF_DIR, "documents").repartition(13, "source")
    again = {
        (r["lang"], r["doc_id"])
        for r in corpus.stratified_bottom_k(docs).collect()
    }
    assert again == base


def test_temperature_mix_invariants(spark):
    rows = corpus.corpus_temperature_mix(spark, SF_DIR).collect()
    assert rows
    total = sum(r["n_docs"] for r in rows)
    target = total // corpus._MIXT_TARGET_DIV
    # floor allocation never overshoots the corpus-wide target
    assert sum(r["quota"] for r in rows) <= target
    # ... and lands within |sources| of it (each floor loses < 1)
    assert sum(r["quota"] for r in rows) > target - len(rows)
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_docs"]
        assert r["n_sampled"] == min(r["quota"], r["n_docs"])
    # temperature flattening: sample fraction is weakly decreasing in
    # stratum size (smaller sources get a boost) wherever quotas aren't
    # clipped by stratum size
    unclipped = [r for r in rows if r["quota"] <= r["n_docs"]]
    by_size = sorted(unclipped, key=lambda r: r["n_docs"])
    fracs = [r["quota"] / r["n_docs"] for r in by_size]
    for a, b in zip(fracs, fracs[1:]):
        assert b <= a + 0.02, fracs  # tolerance: integer floors wobble


def test_isqrt_exactness(spark):
    """The guarded isqrt must be exact at perfect squares and just below."""
    df = spark.createDataFrame(
        [(0,), (1,), (2,), (3,), (4,), (15,), (16,), (17,), (10**12 - 1,), (10**12,)],
        "x: long",
    )
    got = df.select(corpus._isqrt_col(F.col("x")).alias("k"), "x").collect()
    import math

    for r in got:
        assert r["k"] == math.isqrt(r["x"]), r


def test_temperature_fill_matches_plan(spark):
    """The executable fill must deliver exactly n_sampled docs per source
    (the planning lane's number), each source's selection being the hash
    bottom-quota."""
    plan = {r["source"]: r for r in corpus.corpus_temperature_mix(spark, SF_DIR).collect()}
    fill = corpus.corpus_temperature_sample_fill(spark, SF_DIR).collect()
    per_source = Counter(r["source"] for r in fill)
    for source, row in plan.items():
        assert per_source.get(source, 0) == row["n_sampled"], source
    # ranks dense 1..n_sampled, no duplicate docs
    seen = Counter((r["source"], r["rn"]) for r in fill)
    assert all(v == 1 for v in seen.values())
    assert len({r["doc_id"] for r in fill}) == len(fill)


def test_stratified_bottom_k_equals_single_window_on_random_data(spark):
    """The two-phase salted bottom-K must equal the single-window form on
    arbitrary data, not just the shipped corpus — the exactness claim the
    oracle rests on (bottom-K of per-salt bottom-Ks == global bottom-K)."""
    import random as _random

    from pyspark.sql.window import Window as W

    from big_data_analytics_machine_learning_poc_spark.functions.hashing import md5_hash32

    rng = _random.Random(99)
    rows = [
        (rng.choice(["aa", "bb", "cc"]), did)
        for did in rng.sample(range(100_000), 700)
    ]
    docs = spark.createDataFrame(rows, "lang: string, doc_id: long").repartition(7)
    got = {
        (r["lang"], r["doc_id"], r["rn"])
        for r in corpus.stratified_bottom_k(docs, k=25).collect()
    }
    hv = md5_hash32(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("lang").orderBy("hv", "doc_id")
    want = {
        (r["lang"], r["doc_id"], r["rn"])
        for r in docs.select("lang", "doc_id", hv.alias("hv"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .collect()
    }
    assert got == want


def test_template_phrases_threshold_boundary(spark, tmp_path):
    """The >= 8% document-frequency gate is an integer cross-multiply:
    a bigram in exactly 8 of 100 docs is IN, one in 7 is OUT, and
    repeating a phrase many times inside one doc cannot fake corpus-wide
    presence (distinct-per-doc)."""
    from big_data_analytics_machine_learning_poc_spark.operators.corpus import (
        corpus_template_phrases,
    )

    docs = []
    for i in range(100):
        words = [f"u{i}a", f"u{i}b"]  # unique filler bigram per doc
        if i < 8:
            words += ["tpl", "in"]  # "tpl in" -> 8 docs = exactly 8%
        if i < 7:
            words += ["tpl", "out"]  # "tpl out" -> 7 docs < 8%
        if i == 0:
            words += ["spam", "spam", "spam", "spam"]  # intra-doc repeats
        text = " ".join(words)
        docs.append((i, text, "en", "src0", len(text)))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    grams = {r.gram: r.n_docs for r in corpus_template_phrases(spark, str(tmp_path)).collect()}
    assert grams.get("tpl in") == 8
    assert "tpl out" not in grams
    assert "spam spam" not in grams  # 1 doc, however many repeats
