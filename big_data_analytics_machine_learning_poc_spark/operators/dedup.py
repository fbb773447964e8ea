"""Deduplication operators over ``documents`` / ``embeddings``
(BASELINE.json north-star; no reference counterpart — the reference has no
distinct/dropDuplicates call sites at all, SURVEY.md §2.11).

Five families, each shaped for 100 TB:

- exact: hash-groupBy on the full text (one shuffle on a 60-bit fingerprint
  in production, so the shuffle key is 8 bytes, not the document).
- minhash + LSH banding: per-doc signature (map-only) → band-bucket
  equi-join (shuffle on small band keys) → candidate pairs → signature-
  similarity filter. This is the scalable near-dup path: no quadratic step.
- simhash: 16-bit sign-of-weighted-sums fingerprint, map-only per doc.
- n-gram (bigram-shingle) Jaccard: the exact quadratic verifier — used on
  LSH candidates in production; exposed standalone for oracle checking.
- embedding cosine near-dup: pairwise cosine ≥ τ (brute force here; the
  bucketed variant lives in operators/similarity.py).

All hashes are md5-derived (functions/hashing.py) so every stage — including
the banded self-join — has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import MERSENNE_P, MINHASH_PERMS, md5_hash32, md5_hash32_sql
from ..functions.vector import cosine, l2_norm
from ..registry import QueryRegistry
from .text import TOKENS_SQL, tokens_col

REG = QueryRegistry()

N_PERMS = len(MINHASH_PERMS)  # 8 → 4 bands of 2 rows
BANDS = tuple((i, i + 1) for i in range(0, N_PERMS, 2))


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


@REG.add(
    "dedup_exact_stats",
    sql="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_distinct_texts,
           COUNT(*) - COUNT(DISTINCT text) AS n_exact_dups
    FROM documents
    """,
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_exact_dups"),
    )


@REG.add(
    "dedup_exact_groups",
    sql="""
    SELECT MIN(doc_id) AS rep_id, COUNT(*) AS group_size
    FROM documents GROUP BY text HAVING COUNT(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups with a deterministic representative (min doc_id) —
    the keep-one-drop-rest primitive. At 100 TB, group on the 60-bit
    fingerprint first and verify text equality only within fingerprint
    buckets (8-byte shuffle keys instead of full documents)."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") > 1)
        .select("rep_id", "group_size")
    )


# --------------------------------------------------------------------------
# MinHash signatures + LSH banding
# --------------------------------------------------------------------------


def _doc_token_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h): distinct md5-derived 32-bit token hashes per document.
    Map-side explode + distinct — the only wide op is the final groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
        .select("doc_id", md5_hash32(F.col("tok")).alias("h"))
        .distinct()
    )


_TOKEN_HASH_CTE = f"""
    WITH toks AS (
      SELECT doc_id, unnest({TOKENS_SQL}) AS tok FROM documents
    ), th AS (
      SELECT DISTINCT doc_id, {md5_hash32_sql("tok")} AS h FROM toks
    )
"""


def _sig_select_sql() -> str:
    mins = ",\n           ".join(
        f"MIN((h * {a} + {b}) % {MERSENNE_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS)
    )
    return f"SELECT doc_id,\n           {mins}\n    FROM th GROUP BY doc_id"


def minhash_signatures_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    th = _doc_token_hashes(spark, sf_dir)
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return th.groupBy("doc_id").agg(*aggs)


REG.add("dedup_minhash_signatures", sql=f"{_TOKEN_HASH_CTE}\n    {_sig_select_sql()}")(
    minhash_signatures_df
)


def _band_pairs_sql(threshold: float) -> str:
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {bi} AS band, mh{lo} AS h1, mh{hi} AS h2 FROM sig"
        for bi, (lo, hi) in enumerate(BANDS)
    )
    sim = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(N_PERMS)
    )
    return f"""{_TOKEN_HASH_CTE}, sig AS (
      {_sig_select_sql()}
    ), bands AS (
      {band_selects}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(({sim}) AS DOUBLE) / {N_PERMS}, 6) AS est_jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = doc_a
    JOIN sig sb ON sb.doc_id = doc_b
    WHERE CAST(({sim}) AS DOUBLE) / {N_PERMS} >= {threshold}
    """


@REG.add("dedup_minhash_pairs", sql=_band_pairs_sql(0.5))
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-banded near-dup candidates with signature-estimated Jaccard ≥ 0.5.

    Scale shape: signatures are map-only; banding is a narrow unpivot; the
    candidate join is an equi-join on (band, h1, h2) bucket keys — skew-safe
    under AQE; the verifier join touches only candidate pairs. No stage is
    quadratic in corpus size.
    """
    sig = minhash_signatures_df(spark, sf_dir)
    bands = None
    for bi, (lo, hi) in enumerate(BANDS):
        b = sig.select(
            "doc_id", F.lit(bi).alias("band"), F.col(f"mh{lo}").alias("h1"), F.col(f"mh{hi}").alias("h2")
        )
        bands = b if bands is None else bands.unionByName(b)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h1") == F.col("b.h1"))
            & (F.col("a.h2") == F.col("b.h2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa, sb = sig.alias("sa"), sig.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0) for i in range(N_PERMS)
    )
    est = matches.cast("double") / F.lit(N_PERMS)
    return (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(est >= 0.5)
        .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
    )


# --------------------------------------------------------------------------
# SimHash (16-bit)
# --------------------------------------------------------------------------


def _simhash_sql() -> str:
    bits = " + ".join(
        f"CASE WHEN SUM(CASE WHEN (h & {1 << j}) != 0 THEN 1 ELSE -1 END) > 0 THEN {1 << j} ELSE 0 END"
        for j in range(16)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({TOKENS_SQL}) AS tok FROM documents
    ), th AS (
      SELECT doc_id, {md5_hash32_sql("tok")} AS h FROM toks
    )
    SELECT doc_id, ({bits}) AS simhash16 FROM th GROUP BY doc_id
    """


@REG.add("dedup_simhash", sql=_simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit simhash: per bit, sign of Σ(±1) over all token occurrences
    (repeats weight naturally). Map + one groupBy; near-dups differ in ≤k
    bits, findable by hamming-ball probing over 2^16 buckets at scale."""
    docs = load_table(spark, sf_dir, "documents")
    th = docs.select("doc_id", F.explode(tokens_col()).alias("tok")).select(
        "doc_id", md5_hash32(F.col("tok")).alias("h")
    )
    bit_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(16)
    ]
    per_doc = th.groupBy("doc_id").agg(*bit_sums)
    simhash = sum(
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(16)
    )
    return per_doc.select("doc_id", simhash.cast("long").alias("simhash16"))


# --------------------------------------------------------------------------
# N-gram (bigram shingle) Jaccard — exact verifier
# --------------------------------------------------------------------------

_BIGRAMS_SQL = (
    f"list_transform(range(1, len({TOKENS_SQL})), i -> "
    f"{TOKENS_SQL}[i] || ' ' || {TOKENS_SQL}[i+1])"
)


def bigram_shingles() -> Column:
    toks = tokens_col()
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat(F.element_at(toks, i + 1), F.lit(" "), F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


@REG.add(
    "dedup_ngram_jaccard",
    sql=f"""
    WITH sh0 AS (
      SELECT DISTINCT doc_id, unnest({_BIGRAMS_SQL}) AS shingle FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh0 GROUP BY doc_id
    ), sh AS (
      SELECT sh0.doc_id, sh0.shingle, sizes.n FROM sh0 JOIN sizes USING (doc_id)
    ), inter AS (
      -- size-ratio pruning: J >= 1/2 requires max(|A|,|B|) <= 2*min(|A|,|B|)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ni
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                         AND a.n <= 2 * b.n AND b.n <= 2 * a.n
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(ni AS DOUBLE) / (na.n + nb.n - ni), 6) AS jaccard
    FROM inter
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE CAST(ni AS DOUBLE) / (na.n + nb.n - ni) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bigram-shingle-set Jaccard ≥ 0.5 between document pairs.

    The shingle equi-join is only quadratic within a shingle's posting list —
    acceptable as the verifier on LSH candidates; standalone it is the
    small-corpus / oracle-checkable form. A size-ratio prefilter
    (J ≥ τ ⇒ max(|A|,|B|) ≤ |A∩B|·(1+τ)/τ ≤ (1/τ)·min at τ=0.5 ⇒ ≤ 2·min)
    drops hopeless pairs before the counting aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh0 = docs.select("doc_id", F.explode(bigram_shingles()).alias("shingle")).distinct()
    sizes = sh0.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sh = sh0.join(F.broadcast(sizes), "doc_id")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n") <= 2 * F.col("b.n"))
            & (F.col("b.n") <= 2 * F.col("a.n")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    na, nb = sizes.alias("na"), sizes.alias("nb")
    jac = F.col("ni").cast("double") / (F.col("na.n") + F.col("nb.n") - F.col("ni"))
    return (
        inter.join(na, F.col("na.doc_id") == F.col("doc_a"))
        .join(nb, F.col("nb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup (brute force; bucketed variant in similarity.py)
# --------------------------------------------------------------------------


@REG.add(
    "dedup_embedding_cosine",
    sql="""
    WITH normed AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                  i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                 / (a.nrm * b.nrm), 5) AS sim
    FROM normed a JOIN normed b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (a.nrm * b.nrm) >= 0.9
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine ≥ 0.9 over embeddings — the exact near-dup check.
    Quadratic by construction: at 100 TB use the LSH-bucketed ANN path
    (similarity.ann_bucket_cosine) to generate candidates, then this as the
    within-bucket verifier."""
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select("vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm"))
    a, b = normed.alias("a"), normed.alias("b")
    from ..functions.vector import dot

    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(sim >= 0.9)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(sim, 5).alias("sim"),
        )
    )


@REG.add("dedup_mllib_minhash_lsh")  # rows-only: MLlib's minhash coefficients
# are seeded internally — not reproducible in SQL; semantics tested in
# tests/test_text_dedup.py on planted near-dups
def dedup_mllib_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MLlib-native fuzzy-dedup path (SURVEY §4: MinHashLSH +
    approxSimilarityJoin are public DataFrame-native API): token-set →
    binary HashingTF vector → MinHashLSH → self-similarity-join on Jaccard
    distance ≤ 0.5. Complements the md5-based implementation above (which
    exists for cross-engine oracle checkability); this one rides MLlib's
    banding and is the drop-in at scale."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    docs = load_table(spark, sf_dir, "documents")
    toks = Tokenizer(inputCol="text", outputCol="tokens").transform(docs)
    # binary=True → set semantics (presence, not counts), matching Jaccard
    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=1 << 14, binary=True
    ).transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=5, seed=42)
    model = lsh.fit(tf)
    pairs = model.approxSimilarityJoin(tf, tf, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.col("jaccard_dist"), 6).alias("jaccard_dist"),
        )
    )


@REG.add(
    "dedup_keep_first",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber) AS rn
      FROM lineitem WHERE l_orderkey < 2000
    ) WHERE rn = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-one-per-key: window row_number over an explicit
    order, rn=1. This is the engine's canonical subset-dedup —
    ``dropDuplicates(subset)`` keeps an ARBITRARY row (first encountered per
    partition order, nondeterministic on a cluster), so it is banned for
    anything result-bearing; the window form costs the same single shuffle
    and is reproducible."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
