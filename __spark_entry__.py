"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 5-way star join at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (+ the BASELINE.json extension operators) for the DuckDB
differential gate. Registries live next to the operator implementations in
``big_data_analytics_machine_learning_poc_spark/operators/*`` so the Spark query and its oracle
SQL cannot drift apart.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_analytics_machine_learning_poc_spark.registry import QueryRegistry


def _registry() -> QueryRegistry:
    from big_data_analytics_machine_learning_poc_spark.operators import relational

    reg = QueryRegistry()
    reg.merge(relational.REG)
    for mod_name in (
        "text",
        "dedup",
        "similarity",
        "encoding",
        "multimodal",
        "mlops",
        "streaming_ops",
        "asof",
        "skew",
    ):
        try:
            mod = __import__(
                f"big_data_analytics_machine_learning_poc_spark.operators.{mod_name}",
                fromlist=[mod_name],
            )
            reg.merge(mod.REG)
        except ImportError:
            pass  # module not built yet (round-incremental)
    return reg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from big_data_analytics_machine_learning_poc_spark.operators.relational import (
        flagship_regional_revenue,
    )

    return flagship_regional_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_registry().queries)


def oracle_sql() -> dict[str, str]:
    return dict(_registry().oracles)
