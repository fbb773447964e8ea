"""Window-spec factory with a single-reducer guard.

An unpartitioned ``Window.orderBy`` funnels EVERY row through one task — the
classic silent scale-killer: correct at 1 GB, a stuck executor at 100 TB.
Engine code therefore never calls ``Window.orderBy`` directly (enforced by
tests/test_plans.py::test_no_raw_unpartitioned_windows); it goes through
``ranked()``, which demands either a partition key or an explicit
``bounded_input`` justification string documenting why the input is provably
small (a post-aggregation domain, a hard filter cap, ...).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql.window import Window, WindowSpec

ColumnOrName = Column | str


def ranked(
    *order_cols: ColumnOrName,
    partition_by: ColumnOrName | list[ColumnOrName] | tuple[ColumnOrName, ...] | None = None,
    bounded_input: str | None = None,
) -> WindowSpec:
    """Build a WindowSpec. Partitioned windows scale (one shuffle on the
    partition key); unpartitioned ones require ``bounded_input="<why the
    input is small>"`` — the justification is mandatory and shows up at the
    call site, so unbounded reuse can't slip through a refactor silently."""
    if partition_by is not None:
        cols = (
            list(partition_by)
            if isinstance(partition_by, (list, tuple))
            else [partition_by]
        )
        return Window.partitionBy(*cols).orderBy(*order_cols)
    if not bounded_input:
        raise ValueError(
            "unpartitioned window over a potentially unbounded input: pass "
            "partition_by=..., or bounded_input='<why the input is provably "
            "small>' (single-reducer bottleneck at scale otherwise)"
        )
    return Window.orderBy(*order_cols)
