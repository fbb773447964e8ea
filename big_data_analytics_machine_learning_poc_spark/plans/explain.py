"""Helpers over Spark's explain output for asserting physical-plan shape
(pushdown reached the scan, dimensions broadcast, codegen active).

Used by tests/test_plans.py and handy interactively:

    >>> from big_data_analytics_machine_learning_poc_spark import plans
    >>> print(plans.pushed_filters(df))
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lines from every scan in the plan."""
    return [ln.strip() for ln in formatted_plan(df).splitlines() if "PushedFilters" in ln]


def read_schema_line(df: DataFrame) -> str:
    lines = [ln.strip() for ln in formatted_plan(df).splitlines() if "ReadSchema" in ln]
    return lines[0] if lines else ""


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)
