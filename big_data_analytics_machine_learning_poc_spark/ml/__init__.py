"""The reference's four programs re-expressed as seeded PySpark pipelines
(SURVEY.md §2.7–§2.9, §7 M3):

- correlator        ← DataCorrelator.java (clean/bucket/agg/corr/assemble)
- tfidf_regression  ← TfIdfCalculator.java (TF-IDF + LinearRegression)
- random_forest     ← RandomForest.java (indexer/assembler/RF/confusion)
- spam              ← SpamClassification.java (7-stage Pipeline, RF + DT)

Deliberate deviations from the reference (SURVEY §7 known-hard #5):
seeded randomSplit everywhere; clean → split → fit ordering (the reference
fits its StringIndexer on pre-clean data, SpamClassification.java:60-62);
parameterized data paths; caching at fit boundaries.
"""
