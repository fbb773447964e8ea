"""SpamClassification re-expressed (reference: SpamClassification.java:29-131).

The 7-stage Pipeline preserved (:96-99): StringIndexer(v1→label) (:60-62),
Tokenizer(v2→words) (:65-67), StopWordsRemover (:70-72), HashingTF(1000)
(:75-78), IDF (:81-83), classifier (RF :86 / DecisionTree :89), and
IndexToString(prediction→predictedLabel) (:91-93). Both model variants are
fit and evaluated with accuracy + test error (:117-130).

Deliberate fix (SURVEY §7 known-hard #5): the reference splits *before*
selecting/cleaning and fits its indexer on pre-clean train data
(SpamClassification.java:42-62), so empty labels can reach transform. Here:
select → na.drop → seeded split → fit.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import DecisionTreeClassifier, RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import IDF, HashingTF, IndexToString, StopWordsRemover, StringIndexer, Tokenizer
from pyspark.sql import DataFrame

from ..operators.encoding import ENGLISH_STOPWORDS


def build_pipeline(classifier) -> Pipeline:
    indexer = StringIndexer(inputCol="v1", outputCol="label")
    tokenizer = Tokenizer(inputCol="v2", outputCol="words")
    remover = StopWordsRemover(
        inputCol="words", outputCol="kept", stopWords=list(ENGLISH_STOPWORDS)
    )
    tf = HashingTF(inputCol="kept", outputCol="tf", numFeatures=1000)
    idf = IDF(inputCol="tf", outputCol="features")
    return Pipeline(stages=[indexer, tokenizer, remover, tf, idf, classifier])


def run(raw: DataFrame, seed: int = 42) -> dict:
    clean = raw.select("v1", "v2").na.drop().cache()
    try:
        train, test = clean.randomSplit([0.7, 0.3], seed=seed)
        evaluator = MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName="accuracy"
        )
        out: dict = {"n_train": train.count(), "n_test": test.count()}
        for key, clf in (
            ("rf", RandomForestClassifier(labelCol="label", featuresCol="features", seed=seed)),
            ("dt", DecisionTreeClassifier(labelCol="label", featuresCol="features", seed=seed)),
        ):
            model = build_pipeline(clf).fit(train)
            predictions = model.transform(test)
            # stage 7 (SpamClassification.java:91-93): labels come from the
            # fitted indexer model, exactly as the reference passes them
            labels = model.stages[0].labels
            predictions = IndexToString(
                inputCol="prediction", outputCol="predictedLabel", labels=labels
            ).transform(predictions)
            acc = evaluator.evaluate(predictions)
            out[f"{key}_accuracy"] = acc
            out[f"{key}_test_error"] = 1.0 - acc  # SpamClassification.java:126,130
        return out
    finally:
        clean.unpersist()
