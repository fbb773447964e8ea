"""Registry-wide oracle output-type hygiene (VERDICT r3 ask #2).

DuckDB widens integer ``SUM`` (plain and windowed) to ``HUGEINT`` (int128).
Locally that's invisible — Python ``fetchall()`` yields plain ``int`` — but
the driver's order-insensitive hasher normalizes int128 differently from
Spark's int64, producing hash-red rows with rows+schema green (all 11 r3
reds were exactly this). This test ``DESCRIBE``s every registered oracle
and fails if any output column is HUGEINT/UHUGEINT, or a DECIMAL outside
the explicitly-allowed list, so the mistake can never ship again.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TYPES_SF_DIR", "/root/testdata/sf0.001")

# Oracles whose output intentionally carries a DECIMAL column must be listed
# here with a justification; none today.
_DECIMAL_ALLOWED: dict[str, str] = {}

_BANNED = ("HUGEINT", "UHUGEINT")


def _oracle_items():
    import __spark_entry__ as entrymod

    return sorted(entrymod.oracle_sql().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    from big_data_analytics_machine_learning_poc_spark.oracle import register_views

    register_views(c, SF_DIR)
    return c


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=lambda x: x if isinstance(x, str) and "\n" not in x else "")
def test_oracle_output_types(con, name, sql):
    rows = con.execute(f"DESCRIBE (\n{sql}\n)").fetchall()
    bad = []
    for col_name, col_type, *_ in rows:
        up = str(col_type).upper()
        if any(b in up for b in _BANNED):
            bad.append(f"{col_name}: {col_type}")
        if "DECIMAL" in up and name not in _DECIMAL_ALLOWED:
            bad.append(f"{col_name}: {col_type} (DECIMAL not allow-listed)")
    assert not bad, (
        f"oracle '{name}' emits driver-hostile output types: {bad} — "
        f"wrap the aggregate in CAST(... AS BIGINT) (see oracle.py docstring)"
    )
