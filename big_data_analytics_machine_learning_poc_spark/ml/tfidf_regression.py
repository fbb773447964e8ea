"""TfIdfCalculator re-expressed (reference: TfIdfCalculator.java:25-149).

Operator chain preserved: select 6 columns (:38-45) → Tokenizer ×2 (:49-52)
→ StopWordsRemover ×2 (:56-59) → HashingTF(10000) ×2 (:75-82) → IDF ×2
(:87-94) → label alias (:96-103) → StringIndexer on Nationality (:106-107)
→ corr(label, indexed nationality) (:111) → VectorAssembler over the two
tf-idf vectors + Average Score (:114-117) → Normalizer p=1 (:120-124) →
seeded 70/30 split (:126-128; unseeded there) → LinearRegression (:131-139)
→ RMSE (:143-148). Engine upgrades: one Pipeline object, cache before fit,
seeded split.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import (
    IDF,
    HashingTF,
    Normalizer,
    StopWordsRemover,
    StringIndexer,
    Tokenizer,
    VectorAssembler,
)
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.encoding import ENGLISH_STOPWORDS


def featurize_pipeline(num_features: int = 10_000) -> Pipeline:
    stages = []
    for col, prefix in (("Positive Review", "pos"), ("Negative Review", "neg")):
        stages += [
            Tokenizer(inputCol=col, outputCol=f"{prefix}_tokens"),
            StopWordsRemover(
                inputCol=f"{prefix}_tokens",
                outputCol=f"{prefix}_kept",
                stopWords=list(ENGLISH_STOPWORDS),
            ),
            HashingTF(inputCol=f"{prefix}_kept", outputCol=f"{prefix}_tf", numFeatures=num_features),
            IDF(inputCol=f"{prefix}_tf", outputCol=f"{prefix}_tfidf"),
        ]
    stages += [
        StringIndexer(inputCol="Nationality", outputCol="nationality_idx", handleInvalid="keep"),
        VectorAssembler(
            inputCols=["pos_tfidf", "neg_tfidf", "Average Score"], outputCol="features_raw"
        ),
        Normalizer(inputCol="features_raw", outputCol="features", p=1.0),
    ]
    return Pipeline(stages=stages)


def run(reviews: DataFrame, seed: int = 42) -> dict:
    labeled = reviews.withColumn("label", F.col("Reviewer Score")).cache()
    try:
        model = featurize_pipeline().fit(labeled)
        # Materialize the featurized frame ONCE: four downstream actions
        # (corr, the split feeding lr.fit, the RMSE evaluate, n_test)
        # otherwise each replay the full dual tokenize→TF→IDF transform
        # chain (measured r12: steady-state 6.8→5.5 s; metrics
        # bit-identical — checkpoint preserves partitioning and row order,
        # so the seeded randomSplit draws the same rows).
        feats = model.transform(labeled).localCheckpoint()
        try:
            nat_corr = feats.stat.corr("label", "nationality_idx")  # TfIdfCalculator.java:111
            train, test = feats.randomSplit([0.7, 0.3], seed=seed)
            lr = LinearRegression(featuresCol="features", labelCol="label")
            lr_model = lr.fit(train)
            predictions = lr_model.transform(test)
            rmse = RegressionEvaluator(
                labelCol="label", predictionCol="prediction", metricName="rmse"
            ).evaluate(predictions)
            return {
                "nationality_corr": nat_corr,
                "rmse": rmse,
                "n_test": predictions.count(),
            }
        finally:
            # every consumer (corr, fit, evaluate, count) has run and the
            # returned dict is plain metrics — release the checkpoint's
            # blocks instead of leaking them for the session's lifetime
            # (r13 checkpoint hygiene, guide §5)
            from ..functions.ckpt import release_local_checkpoint

            release_local_checkpoint(feats)
    finally:
        labeled.unpersist()
