"""Reusable column-expression builders (JVM-side, whole-stage-codegen friendly).

Everything here returns ``pyspark.sql.Column`` built from built-in functions —
no Python UDFs — so the expressions stay inside Tungsten codegen at 100 TB.
Where an operator must be verified against the DuckDB oracle, the module also
provides the *equivalent SQL text builder* so Spark and the oracle provably
compute the same formula (same hash, same accumulation order).
"""
