"""Driver-runnable ML queries over the sf testdata (rows-only checks: model
outputs are not SQL-expressible — the driver records the documented weaker
check, SURVEY §5).

Each is seeded and partition-stable so repeated runs agree; golden-metric
assertions live in tests/test_ml.py against the FIXTURES.md corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QueryRegistry

REG = QueryRegistry()


@REG.add("ml_rf_confusion")  # rows-only: model predictions not SQL-expressible
def ml_rf_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RandomForest on embeddings (label ← embedding vector), confusion
    matrix as a relational op (mirrors RandomForest.java:86-87)."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("label").cast("double").alias("label"),
        array_to_vector(F.col("embedding")).alias("features"),
    )
    train, test = emb.randomSplit([0.7, 0.3], seed=42)
    model = RandomForestClassifier(
        labelCol="label", featuresCol="features", numTrees=20, seed=42
    ).fit(train)
    preds = model.transform(test)
    return (
        preds.groupBy(
            F.col("label").cast("int").alias("label"),
            F.col("prediction").cast("int").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "prediction")
    )


@REG.add("ml_lr_rmse")  # rows-only
def ml_lr_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LinearRegression: l_extendedprice ~ quantity + discount + tax
    (mirrors TfIdfCalculator.java:131-148's fit→transform→RMSE shape)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("label"), "l_quantity", "l_discount", "l_tax"
    )
    assembled = VectorAssembler(
        inputCols=["l_quantity", "l_discount", "l_tax"], outputCol="features"
    ).transform(li)
    train, test = assembled.randomSplit([0.7, 0.3], seed=42)
    model = LinearRegression(featuresCol="features", labelCol="label").fit(train)
    rmse = RegressionEvaluator(
        labelCol="label", predictionCol="prediction", metricName="rmse"
    ).evaluate(model.transform(test))
    return spark.createDataFrame([(float(rmse),)], ["rmse"])


@REG.add("ml_kmeans_clusters")  # rows-only
def ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded KMeans over embeddings → cluster size distribution (extension
    beyond the reference surface; the unsupervised counterpart of the
    similarity bucketing in operators/similarity.py)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    model = KMeans(k=4, seed=42, featuresCol="features").fit(emb)
    return (
        model.transform(emb)
        .groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )
