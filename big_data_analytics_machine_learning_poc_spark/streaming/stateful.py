"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.11: UDF/stateful surface is NEW; guide §'Structured Streaming').

Per-user running totals with explicit state: the state schema holds
(n, cents), each micro-batch folds its Arrow batches into the state and
emits the updated row. This is the template for any custom accumulator the
built-in windowed aggregates can't express (decaying counters, per-entity
ML feature state, CDC merge state).

Money is accumulated in exact cents (functions/exact.py) so emitted totals
are independent of batch boundaries — which also makes the operator
oracle-checkable against a plain batch aggregation on bounded input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import read_event_stream, run_to_completion

OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
STATE_SCHEMA = "n long, cents long"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(round(pdf["value"] * 100).sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_cents": [cents]})


def running_user_totals(spark: SparkSession, sf_dir: str, max_user: int = 100) -> DataFrame:
    ev = read_event_stream(spark, sf_dir).filter(F.col("user_id") < max_user)
    updated = (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_completion(updated, "update")
