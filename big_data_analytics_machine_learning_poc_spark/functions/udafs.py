"""Vectorized custom aggregates (GROUPED_AGG pandas UDFs).

NOTE: deliberately NO ``from __future__ import annotations`` here — Spark
infers the GROUPED_AGG function type from REAL (non-stringized) type hints
(``pd.Series -> scalar``); stringized annotations would force the
deprecated explicit ``PandasUDFType`` argument.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(chars: pd.Series) -> float:
    """Geometric mean — exp(mean(log(x))) over one group's Arrow batch."""
    return float(np.exp(np.mean(np.log(chars.to_numpy(dtype="float64")))))


@pandas_udf("long")
def n_rows(col: pd.Series) -> int:
    """Group size (mixing built-in count with pandas aggregates in one
    agg() is disallowed, so the count rides the same UDAF lane)."""
    return len(col)
