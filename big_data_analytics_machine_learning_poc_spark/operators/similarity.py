"""Similarity search over the ``embeddings`` table (array<float> column) —
BASELINE.json north-star operator; no reference counterpart.

Three shapes:

- ``knn_brute_cosine``: exact top-k for one query — a single scan + top-k
  (Spark plans TakeOrderedAndProject: per-partition heaps, one merge).
  This is the correctness baseline every ANN variant is measured against.
- ``knn_multi_query``: exact top-k for a query *set* via broadcast-join +
  per-query window top-k — the batch scoring shape (queries broadcast, corpus
  scanned once, no quadratic blowup).
- ``ann_bucket_cosine``: sign-bit LSH (first 8 dimensions → 256 buckets):
  candidates share the query's bucket, exact cosine re-rank inside. At
  100 TB the bucket id becomes the shuffle/partition key, turning ANN into
  a pruned equi-join; recall vs the brute baseline is asserted in
  tests/test_similarity.py.

All cosine math uses the sequential-fold expressions from functions/vector.py
so results are bitwise-reproducible by the DuckDB oracles (then defensively
rounded to 5 decimals before ranking; ties broken by vec_id).
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.vector import cosine, cosine_sql, l2_norm, l2_norm_sql
from ..registry import QueryRegistry

REG = QueryRegistry()

_COS_AB = cosine_sql("a.embedding", "b.embedding")


@REG.add(
    "knn_brute_cosine",
    sql=f"""
    WITH a AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT b.vec_id, ROUND({_COS_AB}, 5) AS sim
    FROM embeddings b, a
    WHERE b.vec_id != 0
    ORDER BY sim DESC, b.vec_id
    LIMIT 10
    """,
)
def knn_brute_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbours of vec_id=0."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .select("vec_id", F.round(cosine(F.col("embedding"), F.col("q")), 5).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


@REG.add(
    "knn_multi_query",
    sql=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, b.vec_id, ROUND({cosine_sql("q.embedding", "b.embedding")}, 5) AS sim
      FROM q JOIN embeddings b ON b.vec_id >= 5
    ), ranked AS (
      SELECT query_id, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
      FROM scored
    )
    SELECT query_id, vec_id, sim, rn FROM ranked WHERE rn <= 3
    """,
)
def knn_multi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 per query for a broadcast query set (batch scoring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", F.round(cosine(F.col("qe"), F.col("embedding")), 5).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "vec_id")
    return scored.select("query_id", "vec_id", "sim", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= 3
    )


# Sign-bit bucket over the first 8 dimensions → 256 buckets.
_N_BUCKET_DIMS = 8


def bucket_col(emb: Column, start: int = 0, ndims: int = _N_BUCKET_DIMS) -> Column:
    """Sign-bit LSH bucket id from ``ndims`` dimensions beginning at ``start``
    (0-based): bit i set iff emb[start+i] >= 0. Multiple disjoint dim ranges
    give independent hash tables (the banding trick for recall).

    try_element_at, not element_at: a ragged/truncated embedding would
    otherwise throw INVALID_ARRAY_INDEX under ANSI mode and kill the whole
    job, while the oracle's CASE on a NULL list index quietly takes the
    ELSE branch — try_element_at's NULL makes the when() fall through to
    the same 0 bit on both engines."""
    return sum(
        F.when(F.try_element_at(emb, F.lit(start + i + 1)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(ndims)
    ).cast("int")


def bucket_sql(col: str, start: int = 0, ndims: int = _N_BUCKET_DIMS) -> str:
    """DuckDB SQL computing exactly bucket_col(col, start, ndims)."""
    return (
        "("
        + " + ".join(
            f"CASE WHEN {col}[{start + i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
            for i in range(ndims)
        )
        + ")"
    )


_bucket_sql = bucket_sql  # backwards-compat alias for the oracle builders below


@REG.add(
    "ann_bucket_cosine",
    sql=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {_bucket_sql("embedding")} AS bucket FROM embeddings
    ), a AS (SELECT embedding, bucket FROM bucketed WHERE vec_id = 0)
    SELECT b.vec_id, ROUND({_COS_AB}, 5) AS sim
    FROM bucketed b, a
    WHERE b.bucket = a.bucket AND b.vec_id != 0
    ORDER BY sim DESC, b.vec_id
    LIMIT 5
    """,
)
def ann_bucket_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: candidates from the query's sign-bit LSH bucket, exact re-rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select("vec_id", "embedding", bucket_col(F.col("embedding")).alias("bucket"))
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q"), F.col("bucket").alias("qbucket")
    )
    return (
        bucketed.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select("vec_id", F.round(cosine(F.col("embedding"), F.col("q")), 5).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(5)
    )


@REG.add("ann_ivf_cosine")  # rows-only: centroids come from seeded KMeans —
# not SQL-derivable; recall vs brute force asserted in tests/test_text_dedup.py
def ann_ivf_cosine(spark: SparkSession, sf_dir: str, k: int = 8, nprobe: int = 2) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus to seeded KMeans centroids,
    probe the ``nprobe`` centroids nearest the query, exact cosine re-rank
    within the probed cells.

    Scale shape: centroid assignment is one broadcast-apply pass (the model
    is KBs); at query time only ~nprobe/k of the corpus is scanned. The
    inverted lists would be materialized as a ``cluster``-partitioned parquet
    in production so probing prunes whole partitions.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", array_to_vector(F.col("embedding")).alias("fv")
    )
    # resolve the query vector BEFORE burning the KMeans fit, and degrade
    # to an empty result when vec_id 0 is absent (filtered corpus, ad-hoc
    # sf_dir) — like knn_brute_cosine, instead of an AttributeError on None
    query_row = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    if query_row is None:
        return spark.createDataFrame([], "vec_id long, sim double")
    qv = list(query_row.embedding)

    model = KMeans(k=k, seed=42, maxIter=8, featuresCol="fv", predictionCol="cluster").fit(emb)
    assigned = model.transform(emb).select("vec_id", "embedding", "cluster")

    centers = model.clusterCenters()

    import math

    def cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    probe = sorted(range(k), key=lambda c: -cos_py(qv, list(centers[c])))[:nprobe]

    q = assigned.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return (
        assigned.filter(F.col("cluster").isin(probe) & (F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine(F.col("embedding"), F.col("q")), 5).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(5)
    )


def build_ivf_index(
    spark: SparkSession, sf_dir: str, index_dir: str, k: int = 8, max_iter: int = 8
) -> list[list[float]]:
    """Materialize the IVF inverted lists as a ``cluster``-partitioned
    parquet index (VERDICT r4 ask #8 — the 100 TB story ann_ivf_cosine's
    docstring narrates, made executable): one seeded-KMeans fit, one
    broadcast-apply assignment pass, one partitioned write. Returns the
    centroids (KB-sized — the only state a prober needs; production would
    persist them next to the index). Probing then reads ONLY the probed
    cells' partitions — ``ivf_probe_index`` + the partition-pruning plan
    assertion in tests/test_similarity_recall.py."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", array_to_vector(F.col("embedding")).alias("fv")
    )
    model = KMeans(k=k, seed=42, maxIter=max_iter, featuresCol="fv", predictionCol="cluster").fit(
        emb
    )
    model.transform(emb).select("vec_id", "embedding", "cluster").write.partitionBy(
        "cluster"
    ).mode("overwrite").parquet(index_dir)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def ingest_vectors(
    batch: DataFrame, index_dir: str, centers: list[list[float]]
) -> None:
    """Append a batch of (vec_id, embedding) rows to a materialized IVF
    index WITHOUT refitting: cells are assigned against the existing
    centroids (index statistics are fixed between rebuilds — the same
    contract as PQ codebooks), so ingest cost is one map-only argmin pass
    over the BATCH plus a dynamic-partition append of only the touched
    cells. Assignment is squared-L2 argmin with lowest-index tie-break —
    identical to KMeans.transform, so an index grown by ingests equals an
    index assigned in one shot with the same centers (pinned by test).

    Built as one generated-SQL argmin (see pq_encode for why not the
    Column API: plan-construction RPCs) over the KB-sized centroid list."""
    k, d = len(centers), len(centers[0])
    cents = []
    for ci, c in enumerate(centers):
        terms = " + ".join(
            f"(try_element_at(embedding, {j + 1}) - {_dlit(c[j])})"
            f" * (try_element_at(embedding, {j + 1}) - {_dlit(c[j])})"
            for j in range(d)
        )
        cents.append(f"struct(({terms}) AS d, {ci} AS i)")
    assign = f"array_min(array({', '.join(cents)})).i"
    (
        batch.select("vec_id", "embedding", F.expr(assign).alias("cluster"))
        .write.partitionBy("cluster")
        .mode("append")
        .parquet(index_dir)
    )


def ivf_probe_index(
    spark: SparkSession,
    index_dir: str,
    centers: list[list[float]],
    qv: list[float],
    nprobe: int = 2,
    topk: int = 5,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Probe a materialized IVF index: rank centroids against the query
    driver-side (k is tiny), then scan ONLY the nprobe nearest cells —
    the ``cluster IN (...)`` filter is a partition predicate, so the scan's
    PartitionFilters prune whole directories and ~ (k-nprobe)/k of the
    corpus is never read. Exact cosine re-rank inside the probed cells,
    TakeOrderedAndProject top-k."""
    import math

    def cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    probe = sorted(range(len(centers)), key=lambda c: -cos_py(qv, centers[c]))[:nprobe]
    lists = spark.read.parquet(index_dir).filter(F.col("cluster").isin([int(p) for p in probe]))
    if exclude_vec_id is not None:
        lists = lists.filter(F.col("vec_id") != exclude_vec_id)
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    return (
        lists.select("vec_id", F.round(cosine(F.col("embedding"), qcol), 5).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(topk)
    )


@REG.add("ann_ivf_partitioned")  # rows-only: centroids come from seeded
# KMeans (not SQL-derivable); equality with the in-memory IVF lane and the
# partition-pruned plan are asserted in tests/test_similarity_recall.py
def ann_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end materialized-IVF ANN: build the cluster-partitioned
    index in a session-temp dir, probe the 2 nearest cells for vec_id 0's
    vector, exact re-rank. Same parameters and result contract as
    ann_ivf_cosine — but the candidate scan is partition-pruned parquet,
    the exact shape a 100 TB deployment runs (index built once by a layout
    job, probed many times)."""
    import atexit
    import shutil
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    query_row = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    if query_row is None:
        return spark.createDataFrame([], "vec_id long, sim double")
    index_dir = tempfile.mkdtemp(prefix="ivf_index_")
    atexit.register(shutil.rmtree, index_dir, ignore_errors=True)
    centers = build_ivf_index(spark, sf_dir, index_dir, k=8)
    return ivf_probe_index(
        spark,
        index_dir,
        centers,
        [float(x) for x in query_row.embedding],
        nprobe=2,
        topk=5,
        exclude_vec_id=0,
    )


@REG.add("similarity_approx_stats")  # rows-only: sketch results are
# implementation-defined; tolerance vs exact asserted in tests
def similarity_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate aggregates a 100 TB pipeline actually runs: HLL++
    distinct counts and quantile sketches (single pass, mergeable, no exact
    shuffle of distincts)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000).alias("value_quantiles"),
    ).select(
        "approx_users",
        F.col("value_quantiles")[0].alias("p50"),
        F.col("value_quantiles")[1].alias("p95"),
        F.col("value_quantiles")[2].alias("p99"),
    )


@REG.add(
    "array_funcs",
    sql="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           ROUND(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS sorted_first
    FROM embeddings WHERE vec_id < 100
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family over the embedding column: size, index access,
    min/max, predicate filter, sort — all codegen'd, the building blocks the
    vector ops compose from."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        # try_element_at: [] yields NULL like the oracle's embedding[1],
        # instead of an ANSI INVALID_ARRAY_INDEX crash
        F.round(F.try_element_at("embedding", F.lit(1)).cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
        F.round(F.try_element_at(F.sort_array("embedding"), F.lit(1)).cast("double"), 6).alias("sorted_first"),
    )


@REG.add(
    "emb_centroid_outliers",
    sql=f"""
    WITH pe AS (
      SELECT label,
             unnest(list_transform(range(1, len(embedding) + 1),
                    i -> {{'i': i, 'v': CAST(embedding[i] AS DOUBLE)}}),
                    recursive := true)
      FROM embeddings
    ), ce AS (
      SELECT label, i, ROUND(AVG(v), 6) AS cv FROM pe GROUP BY label, i
    ), cent AS (
      SELECT label, list(cv ORDER BY i) AS c FROM ce GROUP BY label
    ), scored AS (
      SELECT e.label, e.vec_id, {cosine_sql("e.embedding", "cent.c")} AS cos
      FROM embeddings e JOIN cent USING (label)
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(AVG(cos), 6) AS avg_cos,
           CAST(SUM(CASE WHEN cos < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM scored GROUP BY label ORDER BY label
    """,
)
def emb_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality screen: per-label centroid (dimension-wise mean),
    then each vector's cosine to its own centroid; vectors pointing away
    (cos < 0) are mislabeled/outlier candidates — the standard embedding
    sanity pass before training on labeled vectors.

    Scale shape: posexplode is narrow (vec_id never travels), the centroid
    is a partial+final agg on (label, dim) — 10×64 groups here, still tiny
    at any corpus size — and the scoring join broadcasts the centroids, so
    the corpus is scanned exactly twice with no wide shuffle. Exactness:
    centroid components are ROUND(…,6)-snapped so both engines score with
    bitwise-identical centroids; the cosine fold is sequential on both
    sides, making the cos<0 outlier compare engine-exact (only the final
    AVG needs its own ROUND guard).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    ce = pe.groupBy("label", "pos").agg(
        F.round(F.avg(F.col("v").cast("double")), 6).alias("cv")
    )
    cent = ce.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
        ).alias("c")
    )
    cos = cosine(F.col("embedding"), F.col("c"))
    scored = emb.join(F.broadcast(cent), "label").select(
        "label", "vec_id", cos.alias("cos")
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("cos"), 6).alias("avg_cos"),
            F.sum(F.when(F.col("cos") < 0, 1).otherwise(0)).alias("n_outliers"),
        )
        .orderBy("label")
    )


@REG.add(
    "emb_norm_stats",
    sql=f"""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG({l2_norm_sql("embedding")}), 6) AS avg_norm,
           ROUND(MIN({l2_norm_sql("embedding")}), 6) AS min_norm,
           ROUND(MAX({l2_norm_sql("embedding")}), 6) AS max_norm,
           CAST(SUM(CASE WHEN {l2_norm_sql("embedding")} = 0.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
    FROM embeddings GROUP BY label ORDER BY label
    """,
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-hygiene screen: per-label L2-norm distribution plus a
    zero-vector count. Run before any cosine-based stage — zero vectors
    make cosine undefined and wildly varying norms usually mean mixed
    encoder versions in one corpus. Scale shape: the norm is a codegen'd
    sequential fold per row (functions/vector.py — no Python, no shuffle);
    the agg is partial+final over ~10 label groups. MIN/MAX of the fold
    are engine-exact; only AVG needs its ROUND snap."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = l2_norm(F.col("embedding"))
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(nrm), 6).alias("avg_norm"),
            F.round(F.min(nrm), 6).alias("min_norm"),
            F.round(F.max(nrm), 6).alias("max_norm"),
            F.sum(F.when(nrm == 0.0, 1).otherwise(0)).alias("n_zero"),
        )
        .orderBy("label")
    )


@REG.add(
    "emb_int8_quantization",
    sql="""
    WITH q AS (
      SELECT label,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx,
             embedding
      FROM embeddings
    ), e AS (
      SELECT label,
             CAST(ROUND(mx * 1000000) AS BIGINT) AS scale_units,
             CAST(ROUND(list_max(list_transform(embedding, x ->
                 abs(floor(CAST(x AS DOUBLE) * 127 / mx + 0.5) * mx / 127
                     - CAST(x AS DOUBLE)))) * 1000000000) AS BIGINT) AS err_units
      FROM q WHERE mx > 0
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(err_units) AS DOUBLE) / COUNT(*) / 1000000000 AS avg_max_err,
           CAST(MAX(err_units) AS DOUBLE) / 1000000000 AS worst_err,
           CAST(SUM(scale_units) AS DOUBLE) / COUNT(*) / 1000000 AS avg_scale
    FROM e GROUP BY label ORDER BY label
    """,
)
def emb_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization audit — the memory-compression
    step before a large ANN index (4× smaller than float32; at 100 TB of
    embeddings the index either quantizes or doesn't fit). Each vector gets
    scale = max|x|; codes are floor(x·127/scale + 0.5); the query reports
    per-label reconstruction error (max abs per vector, then avg/worst) and
    the average scale. Scale shape: pure codegen'd higher-order array ops
    (transform/array_max) — map-only until a partial+final agg on ~10
    labels; no Python, no shuffle of vector payloads. Exactness: all
    element math is double with identical operand order in both engines,
    then per-vector results are snapped to integer units (the cents trick)
    so the aggregate sums are associative and engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double"))))
    d = emb.withColumn("mx", mx).filter(F.col("mx") > 0)
    recon_err = F.array_max(
        F.transform(
            F.col("embedding"),
            lambda x: F.abs(
                F.floor(x.cast("double") * 127 / F.col("mx") + F.lit(0.5))
                * F.col("mx")
                / 127
                - x.cast("double")
            ),
        )
    )
    d = d.select(
        "label",
        F.round(F.col("mx") * 1_000_000).cast("long").alias("scale_units"),
        F.round(recon_err * 1_000_000_000).cast("long").alias("err_units"),
    )
    return (
        d.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.sum("err_units").cast("double") / F.count(F.lit(1)) / 1_000_000_000)
            .alias("avg_max_err"),
            (F.max("err_units").cast("double") / 1_000_000_000).alias("worst_err"),
            (F.sum("scale_units").cast("double") / F.count(F.lit(1)) / 1_000_000)
            .alias("avg_scale"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# ANN recall audit: measured recall@K of the banded sign-bucket ANN against
# the exact brute-force baseline, as ONE oracle-checked query
# --------------------------------------------------------------------------

_RECALL_K = 10
_RECALL_NQ = 5  # queries = vec_id < 5, corpus = the rest
_RECALL_TABLES: tuple[tuple[int, int], ...] = ((0, 8), (8, 8))  # (start, ndims)
# per hash table — same banding geometry as dedup_embedding_cosine


def _recall_tables_sql(col: str) -> str:
    """UNION ALL arm per hash table: (t, bkt) rows for one vector column."""
    return " UNION ALL ".join(
        f"SELECT {{key}} , {t} AS t, {bucket_sql(col, s, n)} AS bkt FROM {{src}}"
        for t, (s, n) in enumerate(_RECALL_TABLES)
    )


@REG.add(
    "ann_recall_at_k",
    sql=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding FROM embeddings
      WHERE vec_id < {_RECALL_NQ}
    ), corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {_RECALL_NQ}
    ), scored AS (
      SELECT q.query_id, b.vec_id,
             ROUND({cosine_sql("q.embedding", "b.embedding")}, 5) AS sim
      FROM q JOIN corpus b ON TRUE
    ), brute AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {_RECALL_K}
    ), qb AS (
      {_recall_tables_sql("embedding").format(key="query_id", src="q")}
    ), cb AS (
      {_recall_tables_sql("embedding").format(key="vec_id", src="corpus")}
    ), cand AS (
      SELECT DISTINCT qb.query_id, cb.vec_id
      FROM qb JOIN cb ON qb.t = cb.t AND qb.bkt = cb.bkt
    ), ann_top AS (
      SELECT query_id, vec_id FROM (
        SELECT s.query_id, s.vec_id,
               ROW_NUMBER() OVER (PARTITION BY s.query_id
                                  ORDER BY s.sim DESC, s.vec_id) AS rn
        FROM scored s JOIN cand c
          ON c.query_id = s.query_id AND c.vec_id = s.vec_id
      ) WHERE rn <= {_RECALL_K}
    ), hits AS (
      SELECT a.query_id, COUNT(*) AS n_hits
      FROM ann_top a JOIN brute b
        ON a.query_id = b.query_id AND a.vec_id = b.vec_id
      GROUP BY a.query_id
    ), ncand AS (
      SELECT query_id, COUNT(*) AS n_candidates FROM cand GROUP BY query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(nc.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0) / {_RECALL_K}.0, 3) AS recall_at_k
    FROM q
    LEFT JOIN ncand nc ON nc.query_id = q.query_id
    LEFT JOIN hits h ON h.query_id = q.query_id
    ORDER BY q.query_id
    """,
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@{_RECALL_K} of the banded sign-bucket ANN against the
    exact brute-force baseline, per query — the certification number an ANN
    index must produce before it replaces exact search in production.

    Both lanes run in ONE plan so the audit is self-consistent: the brute
    side is the broadcast-query-batch exact scorer (the audit-only portion —
    at 100 TB you certify on a SAMPLED query set, exactly this shape: |Q|
    stays tiny while the corpus is scanned once); the ANN side generates
    candidates through {len(_RECALL_TABLES)} sign-bucket hash tables emitted
    with ONE explode per side and matched by (table, bucket) EQUI-join —
    never a quadratic stage — then exact-reranks candidates only. Ranking
    is deterministic both sides (sim rounded to 5 dp, ties by vec_id), so
    DuckDB reproduces candidates, top-ks, and the recall numbers exactly.

    Reading the output: recall_at_k is the fraction of true top-{_RECALL_K}
    neighbours the ANN lane recovered; n_candidates over corpus size is the
    pruning factor the recall was bought with (more tables/bits trade
    candidates for recall). On the ISOTROPIC-RANDOM testdata embeddings the
    measured recall sits near the random-pruning floor — correctly: random
    vectors have no neighbours meaningfully closer than ambient similarity,
    which is precisely what this audit exists to expose before an index
    ships. On clustered data the same machinery certifies high recall
    (tests/test_similarity_recall.py plants clusters and asserts it)."""
    return recall_audit(load_table(spark, sf_dir, "embeddings"))


def recall_audit(
    emb: DataFrame,
    nq: int = _RECALL_NQ,
    k: int = _RECALL_K,
    tables: tuple[tuple[int, int], ...] = _RECALL_TABLES,
) -> DataFrame:
    """Core of ann_recall_at_k over any (vec_id, embedding) DataFrame —
    factored out so tests can run the identical audit on planted clustered
    corpora.

    The |Q|-row query frame is materialized once (localCheckpoint): it has
    THREE plan consumers (the broadcast scorer, its bucket emission, and
    the final per-query join), and uncheckpointed the executed plan
    scanned embeddings.parquet 9× with 0 ReusedExchange — measured
    0.75 s → 0.60 s at sf0.1, and at 100 TB the query frame is exactly
    the thing you pin while the corpus streams past once per side.
    Deliberately NOT materializing ``scored``: its two consumers (brute
    top-k, candidate re-rank) would save one cosine pass, but the
    |Q|·|corpus| spill measured net-negative (0.82 s) at this geometry."""
    q = (
        emb.filter(F.col("vec_id") < nq)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
        .localCheckpoint()
    )
    corpus = emb.filter(F.col("vec_id") >= nq)
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("qe"), F.col("embedding")), 5).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "vec_id")
    brute = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id")
    )

    def tables_col(e: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"), bucket_col(e, s, n).alias("bkt")
                )
                for t, (s, n) in enumerate(tables)
            ]
        )

    qb = q.select(
        "query_id", F.explode(tables_col(F.col("qe"))).alias("tb")
    ).select("query_id", "tb.t", "tb.bkt")
    cb = corpus.select(
        "vec_id", F.explode(tables_col(F.col("embedding"))).alias("tb")
    ).select("vec_id", "tb.t", "tb.bkt")
    cand = qb.join(cb, ["t", "bkt"]).select("query_id", "vec_id").distinct()
    ann_top = (
        scored.join(cand, ["query_id", "vec_id"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id")
    )
    hits = (
        ann_top.join(brute, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    ncand = cand.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_candidates"))
    return (
        q.select("query_id")
        .join(ncand, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_candidates"), F.lit(0)).alias("n_candidates"),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)), 3
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance scoring — the index
# COMPRESSION step of the ANN story (brute → sign-LSH → IVF → PQ)
# --------------------------------------------------------------------------

_PQ_M = 8          # subspaces (64-dim embeddings → 8 dims per subspace)
_PQ_KSUB = 16      # centroids per subspace → 4 bits/code, M bytes/vector
_PQ_RERANK = 50    # exact re-rank depth after ADC preselection


def _kmeans_lloyd(X, k: int, seed: int, max_iter: int):
    """Seeded kmeans++-initialised Lloyd's over a (n, dsub) ndarray —
    driver-side, numpy-vectorized. n is bounded by the caller's sample cap
    and dsub by the subspace width, so the n×k distance matrix is KBs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = len(X)
    k = min(k, n)
    centers = np.empty((k, X.shape[1]), dtype=np.float64)
    centers[0] = X[rng.integers(n)]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for j in range(1, k):
        tot = d2.sum()
        pick = rng.choice(n, p=d2 / tot) if tot > 0 else rng.integers(n)
        centers[j] = X[pick]
        d2 = np.minimum(d2, ((X - centers[j]) ** 2).sum(axis=1))
    for _ in range(max_iter):
        dists = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        labels = dists.argmin(axis=1)
        for j in range(k):
            members = X[labels == j]
            if len(members):
                centers[j] = members.mean(axis=0)
    return centers


def train_pq_codebooks(
    emb: DataFrame,
    m: int = _PQ_M,
    ksub: int = _PQ_KSUB,
    max_iter: int = 8,
    sample_cap: int = 4096,
) -> list[list[list[float]]]:
    """Per-subspace codebooks: split each vector into ``m`` contiguous
    subvectors and KMeans each subspace independently (seeded). Returns
    [m][ksub][dsub] centroids — m·ksub·dsub floats total (for 64-dim /
    m=8 / ksub=16: 8 KiB), broadcastable state like the IVF centroids.

    Scale shape: codebooks are a statistic of the DISTRIBUTION, not of
    every row, so training reads one seeded sample of ≤``sample_cap``
    vectors to the driver and runs numpy Lloyd's per subspace there — the
    standard PQ-training recipe (sample-then-fit; cf. Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011). The distributed
    cost is ONE bounded-sample scan; the r5 MLlib variant (8 KMeans fits =
    8× full-corpus scans + iteration jobs) measured ~16 s on the sf0.1 lane
    vs ~4 s for this, identical recall on the planted-cluster tests."""
    import numpy as np

    stats = emb.select(
        F.count(F.lit(1)).alias("n"), F.min(F.size("embedding")).alias("d")
    ).first()
    n, d = stats["n"], stats["d"]
    if not n:
        raise ValueError("cannot train PQ codebooks on an empty frame")
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    sample = emb.select("embedding")
    if n > sample_cap:
        # slight over-sample so the post-filter count stays near the cap
        sample = sample.sample(fraction=min(1.0, 1.1 * sample_cap / n), seed=42)
    X = np.array(
        [r["embedding"] for r in sample.limit(sample_cap).collect()],
        dtype=np.float64,
    )
    return [
        _kmeans_lloyd(
            X[:, i * dsub : (i + 1) * dsub], ksub, seed=42 + i, max_iter=max_iter
        ).tolist()
        for i in range(m)
    ]


def _dlit(x: float) -> str:
    """Exact DOUBLE literal for generated SQL (string-cast round-trips the
    full float precision; bare decimal literals would parse as DECIMAL)."""
    return f"CAST('{x!r}' AS DOUBLE)"


def pq_encode(emb: DataFrame, books: list[list[list[float]]]) -> DataFrame:
    """(vec_id, codes array<int>) — each vector compressed to ``m`` code
    ids by nearest-centroid per subspace: for 4-bit codes this is a 32×
    memory reduction vs float32, the lever that decides whether a 100 TB
    corpus' index fits in cluster RAM. Map-only over the corpus, no
    shuffle.

    The argmin runs as an Arrow-batched ``pandas_udf``: per batch, one
    numpy broadcast computes every (row, centroid) squared distance for a
    subspace and ``argmin`` takes first-minimum (== lowest centroid index
    on ties, the same tie-break as the struct-min SQL form). This is the
    sanctioned vectorized slow-path, and here it BEATS the pure-SQL
    rendering on both plan-construction and execution (r6, measured at
    sf0.1): the m=8/ksub=16/dsub=8 geometry's 2 048 straight-line
    multiply-adds exceed the JVM's 64 KB codegen method limit, so the SQL
    form paid 1.3 s of expression PARSING plus a 3.7 s interpreted-
    projection fallback per encode — the Arrow path plans in
    milliseconds and encodes the same frame in ~0.5 s. (The r5 history of
    the SQL form — one generated SQL string per subspace because the
    Column API costs a Py4J round-trip per operator, ~9 s of pure
    construction — is preserved in git; the lesson generalizes: >1000-term
    expressions forfeit codegen and should move to Arrow.)"""
    import numpy as np

    cents = [np.asarray(b, dtype=np.float64) for b in books]
    m, dsub = len(cents), cents[0].shape[1]

    @F.pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        X = np.vstack(col.to_numpy()).astype(np.float64)
        codes = np.empty((X.shape[0], m), dtype=np.int32)
        for i in range(m):
            sub = X[:, i * dsub : (i + 1) * dsub]
            # (rows, ksub, dsub) diff → squared L2 per centroid; argmin
            # returns the FIRST minimum (lowest centroid id on exact ties)
            d = ((sub[:, None, :] - cents[i][None, :, :]) ** 2).sum(axis=2)
            codes[:, i] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return emb.select("vec_id", encode(F.col("embedding")).alias("codes"))


def pq_adc_scores(
    codes: DataFrame, books: list[list[list[float]]], qv: list[float]
) -> DataFrame:
    """Asymmetric-distance scoring: the query stays EXACT while corpus
    vectors are their PQ codes — approx dot(q, x) = Σ_i dot(q_sub_i,
    centroid[i][code_i]), a lookup in an m×ksub table computed driver-side
    once per query (m·ksub multiplies) and baked in as literals. Scoring a
    vector is then m integer-indexed adds over codegen'd array literals:
    the scan never touches float vectors at all — that's the ADC bargain,
    index bytes and scan FLOPs both ~m/(4·d) of exact. Generated as one
    SQL expression (same construction-cost rationale as ``pq_encode``)."""
    m, dsub = len(books), len(books[0][0])
    tables = [
        [
            sum(qv[i * dsub + j] * c[j] for j in range(dsub))
            for c in books[i]
        ]
        for i in range(m)
    ]
    score = " + ".join(
        f"try_element_at(array({', '.join(_dlit(float(v)) for v in tables[i])}), "
        f"try_element_at(codes, {i + 1}) + 1)"
        for i in range(m)
    )
    return codes.select("vec_id", F.expr(score).alias("adc_dot"))


@REG.add("ann_pq_adc")  # rows-only: codebooks come from seeded KMeans (not
# SQL-derivable); recall on planted clusters + the compression contract are
# asserted in tests/test_similarity_recall.py
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end PQ-compressed ANN for vec_id 0's vector: train per-
    subspace codebooks, encode the corpus to m-byte codes, preselect the
    top-{_PQ_RERANK} by ADC score, exact-cosine re-rank to the top-5.

    Scale shape: train on a sample (codebooks are distribution statistics);
    encode is one map-only pass; the ADC scan reads ONLY the codes column
    (m ints/row instead of the float vector — the column-pruned projection
    is the point); preselection is TakeOrderedAndProject; the exact re-rank
    touches {_PQ_RERANK} full vectors via an id equi-join. Production
    composes this with the IVF partitioning (build_ivf_index) — coarse
    cells prune the scan, PQ shrinks what remains."""
    emb = load_table(spark, sf_dir, "embeddings")
    query_row = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    if query_row is None:
        return spark.createDataFrame([], "vec_id long, sim double")
    qv = [float(x) for x in query_row.embedding]
    corpus = emb.filter(F.col("vec_id") != 0)
    books = train_pq_codebooks(corpus)
    codes = pq_encode(corpus, books)
    shortlist = (
        pq_adc_scores(codes, books, qv)
        .orderBy(F.col("adc_dot").desc(), "vec_id")
        .limit(_PQ_RERANK)
        .select("vec_id")
    )
    q = F.array(*[F.lit(x) for x in qv])
    return (
        corpus.join(F.broadcast(shortlist), "vec_id")
        .select("vec_id", F.round(cosine(F.col("embedding"), q), 5).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(5)
    )
