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
    from ..functions.exact import cents_pandas

    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # half-away rounding matching F.round / DuckDB ROUND (cents_pandas
        # docstring) — pandas' own round() is half-to-even. dropna matches
        # SQL SUM semantics: a NULL value doesn't contribute cents (the row
        # still counts in n_events, like COUNT(*)) — and int(NaN) would
        # otherwise crash the state worker on the first null
        cents += int(cents_pandas(pdf["value"].dropna()).sum())
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
    out = run_to_completion(updated, "update")
    # Update-mode memory sink holds one row per (user, micro-batch). With the
    # single-file testdata that is one row per user already, but a multi-file
    # layout triggers several batches — keep the FINAL state per user: the
    # event count strictly grows per update, so the struct-max row is the
    # last one (cents ride along; works even if values were negative). This
    # makes the operator's contract independent of the source file layout.
    last = F.max(F.struct("n_events", "total_cents"))
    return out.groupBy("user_id").agg(
        last.getField("n_events").alias("n_events"),
        last.getField("total_cents").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4's successor API to
# applyInPandasWithState: explicit StatefulProcessor lifecycle, composable
# typed state, timers). The PySpark side of this API requires google.protobuf
# for its state-server protocol; this container does not ship protobuf, so
# the operator is gated behind a runtime probe (same policy as
# sources/lakehouse.py) and is NOT registered as a driver query. The
# semantics it would compute are identical to running_user_totals above —
# tests/test_streaming.py proves equality when the dependency is present.
# ---------------------------------------------------------------------------


def tws_available() -> bool:
    try:
        import google.protobuf  # noqa: F401  (transformWithState state protocol)

        return True
    except ImportError:
        return False


def tws_user_totals(spark: SparkSession, sf_dir: str, max_user: int = 100) -> DataFrame:
    """Per-user exact-cents totals via transformWithStateInPandas.

    Raises ImportError where google.protobuf is unavailable (this
    container); the applyInPandasWithState twin (running_user_totals) is the
    equivalent supported path here."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf, which is not "
            "installed; use running_user_totals (applyInPandasWithState)"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n LONG, cents LONG")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            from ..functions.exact import cents_pandas

            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                # dropna: SQL SUM semantics, and int(NaN) would crash
                cents += int(cents_pandas(pdf["value"].dropna()).sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    ev = read_event_stream(spark, sf_dir).filter(F.col("user_id") < max_user)
    out = (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_UserTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
    return run_to_completion(out, "update")
