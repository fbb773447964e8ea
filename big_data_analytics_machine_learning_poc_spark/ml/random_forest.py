"""RandomForest re-expressed (reference: RandomForest.java:23-93).

Chain preserved: describe() (:37) → StringIndexer SKL→IND_SKL (:40-42) +
label↔index audit groupBy (:43) → label alias + feature select (:47-54) →
VectorAssembler over the 5 study features (:57-61) → seeded 70/30 split
(:65-67; unseeded there) → RandomForestClassifier (:69-71, defaults,
numTrees=20) → IndexToString on label and prediction (:75-78) → confusion
matrix as groupBy(label, prediction).count() (:86-87) → f1 (the evaluator's
default metric — the reference sets none, :90-92).
"""

from __future__ import annotations

from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import IndexToString, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame

FEATURES = ["SST", "SRT", "SAT", "SAP", "SEP"]


def run(data: DataFrame, seed: int = 42, num_trees: int = 20) -> dict:
    indexer_model = StringIndexer(inputCol="SKL", outputCol="label").fit(data)
    indexed = indexer_model.transform(data).cache()
    try:
        audit = indexed.groupBy("SKL", "label").count().collect()  # RandomForest.java:43
        assembled = VectorAssembler(inputCols=FEATURES, outputCol="features").transform(indexed)
        train, test = assembled.randomSplit([0.7, 0.3], seed=seed)

        rf = RandomForestClassifier(
            labelCol="label", featuresCol="features", numTrees=num_trees, seed=seed
        )
        model = rf.fit(train)
        predictions = model.transform(test)

        labels = indexer_model.labels
        predictions = IndexToString(
            inputCol="label", outputCol="labelStr", labels=labels
        ).transform(predictions)
        predictions = IndexToString(
            inputCol="prediction", outputCol="predictionStr", labels=labels
        ).transform(predictions)

        confusion = (
            predictions.groupBy("labelStr", "predictionStr").count().collect()
        )  # RandomForest.java:86-87
        f1 = MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction"
        ).evaluate(predictions)  # default metric = f1, RandomForest.java:90-92
        return {
            "label_audit": audit,
            "confusion": confusion,
            "f1": f1,
            "n_test": predictions.count(),
            "feature_importances": model.featureImportances.toArray().tolist(),
            # RandomForest.java:72 prints the fitted model dump; surfaced here
            # with its structural stats so callers (and tests) can audit it.
            "model_debug": model.toDebugString,
            "num_trees": model.getNumTrees,
            "total_num_nodes": model.totalNumNodes,
        }
    finally:
        indexed.unpersist()
