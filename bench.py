"""Benchmark harness (driver contract; see BASELINE.md §3).

Runs the six BASELINE queries (same names as BASELINE.md rows) on one warm
SparkSession at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
local[$SPARK_GRAFT_CPUS]; per BASELINE.md §3 each query is executed once for
warmup, then timed (median of 3), so the number is engine time, not JVM
startup. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = ("agg_avg_max", "group_filter", "join3_agg", "describe", "corr", "group_count")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from big_data_analytics_machine_learning_poc_spark.operators import relational
    from big_data_analytics_machine_learning_poc_spark.session import get_session

    # micro profile: AQE off / small shuffle fan-out — at sf0.1 every stage is
    # sub-second, so adaptive re-planning only adds overhead (session.py
    # documents the measurement; a cluster-scale run uses the default profile)
    spark = get_session("bench", cpus=cpus, profile="micro")

    results: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = relational.REG.queries[name]
        fn(spark, sf_dir).collect()  # warmup: JIT + parquet footer cache
        fn(spark, sf_dir).collect()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(times), 4)

    total = round(sum(results.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_6q",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
