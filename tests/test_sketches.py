"""Sketch-lane tests: oracle parity for the exact bitmap lane, and
estimate-quality bounds for the HLL/theta/KLL audit lanes (whose outputs are
Datasketches-implementation-defined and therefore rows-only at the driver).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.operators import sketches

from .conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(sketches.REG.oracles))
def test_sketch_oracle_parity(spark, duck, name):
    from big_data_analytics_machine_learning_poc_spark.oracle import compare_query

    problems = compare_query(
        sketches.REG.queries[name](spark, SF_DIR), duck, sketches.REG.oracles[name]
    )
    assert not problems, f"{name}: {problems}"


def test_bitmap_matches_count_distinct(spark):
    """The bitmap two-level aggregation is exactly COUNT(DISTINCT) — checked
    in-engine too (the oracle test checks vs DuckDB; this one pins the
    equivalence against Spark's own countDistinct on the same session)."""
    from big_data_analytics_machine_learning_poc_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    exact = {
        (r["event_type"], r["day"]): r["n"]
        for r in ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        (r["event_type"], r["day"]): r["n_users"]
        for r in sketches.agg_bitmap_distinct_users(spark, SF_DIR).collect()
    }
    assert got == exact


def test_hll_theta_estimates_within_bound(spark):
    rows = sketches.agg_hll_theta_distinct_audit(spark, SF_DIR).collect()
    assert rows, "audit produced no groups"
    for r in rows:
        exact = r["exact_users"]
        assert exact > 0
        assert abs(r["hll_estimate"] - exact) / exact <= sketches.SKETCH_REL_ERR_MAX, r
        assert abs(r["theta_estimate"] - exact) / exact <= sketches.SKETCH_REL_ERR_MAX, r


def test_kll_quantiles_within_rank_error(spark):
    """A KLL quantile's guarantee is on RANK, not value: the returned element
    must sit within ±KLL_RANK_ERR_MAX of the target rank in the group's
    exact CDF. Compute each group's empirical CDF at the returned values and
    assert the rank error bound."""
    from big_data_analytics_machine_learning_poc_spark.catalog import load_table

    out = {r["event_type"]: r for r in sketches.agg_kll_value_quantiles(spark, SF_DIR).collect()}
    assert out
    ev = load_table(spark, SF_DIR, "events").select("event_type", "value").collect()
    by_group: dict[str, list[float]] = {}
    for r in ev:
        by_group.setdefault(r["event_type"], []).append(r["value"])
    for g, row in out.items():
        vals = sorted(by_group[g])
        n = len(vals)
        assert row["n_events"] == n
        for q in (0.5, 0.9, 0.99):
            got = row[f"kll_p{round(q * 100)}"]
            # empirical rank of the returned value (fraction of items <= got)
            import bisect

            rank = bisect.bisect_right(vals, got) / n
            assert abs(rank - q) <= sketches.KLL_RANK_ERR_MAX + 1.0 / n, (
                g,
                q,
                got,
                rank,
            )
