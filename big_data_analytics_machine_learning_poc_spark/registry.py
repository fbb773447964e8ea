"""Tiny query registry: keeps each Spark query and its DuckDB oracle SQL
adjacent, so the driver contract (__spark_entry__.queries/oracle_sql) is
assembled mechanically and the two sides can't drift apart silently.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class QueryRegistry:
    def __init__(self) -> None:
        self.queries: dict[str, QueryFn] = {}
        self.oracles: dict[str, str] = {}

    def add(self, name: str, sql: str | None = None) -> Callable[[QueryFn], QueryFn]:
        """Register ``fn`` under ``name``; ``sql`` is the DuckDB oracle (omit
        only for genuinely non-SQL-expressible ops → driver does a weaker
        rows-only check)."""

        def deco(fn: QueryFn) -> QueryFn:
            if name in self.queries:
                raise ValueError(f"duplicate query name {name!r}")
            self.queries[name] = fn
            if sql is not None:
                self.oracles[name] = sql
            return fn

        return deco

    def merge(self, other: "QueryRegistry") -> None:
        for name in other.queries:
            if name in self.queries:
                raise ValueError(f"duplicate query name {name!r} on merge")
        self.queries.update(other.queries)
        self.oracles.update(other.oracles)
