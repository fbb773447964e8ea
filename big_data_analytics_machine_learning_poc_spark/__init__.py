"""PySpark-native analytics engine with the query/data-processing surface of
jeevkulk/big-data-analytics-machine-learning-poc, rebuilt Spark-first.

The reference (see SURVEY.md) is four Java Spark-client programs; this package
re-expresses their whole operator inventory as an idiomatic PySpark library —
``pyspark.sql`` DataFrame ops + ``pyspark.ml`` pipelines — and extends it with
the large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) required by BASELINE.json, all designed for
a multi-executor cluster at 100 TB even though tests run on local[32].

Layout:
  session.py    — SparkSession factory (AQE, shuffle partitions, UTC, Arrow)
  catalog.py    — explicit schemas + loaders for the star-schema testdata
  operators/    — relational, dedup, similarity, text, multimodal, encoding
  functions/    — reusable column expressions (vector math, stable hashing)
  ml/           — the four reference programs as seeded PySpark pipelines
  streaming/    — Structured Streaming over the events table
  plans/        — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
