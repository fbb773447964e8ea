"""Local mimic of the driver's DuckDB differential gate.

    python tools/compare.py [sf_dir] [query ...]
    python tools/compare.py [sf_dir] --bare [query ...]

``--bare`` runs under a DEFAULT-builder SparkSession (no factory confs —
UTC/ANSI/Arrow/AQE all at Spark defaults), the closest local mimic of
the driver's own session; the r6-close bare-session sweep is what closes
the session-profile differential risk each round. ``sweep()`` is
importable — tools/sweep3.py reuses it to run the same gate at several
scale factors in one session (VERDICT r5 ask #6: the sf0.1 sweep caught
a banker's-rounding fork the gate SF could not see).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def sweep(spark, sf_dir: str, only: set[str] | None = None, sidecar_suffix: str = ""):
    """Run the differential gate for ``only`` (or every) registered lane at
    ``sf_dir``; returns (n_pass, n_fail, n_rowsonly). ``sidecar_suffix``
    keeps multi-SF runs from clobbering the canonical sf0.01 DIAG
    sidecars."""
    import __spark_entry__ as entrymod
    from big_data_analytics_machine_learning_poc_spark.oracle import compare_query, register_views

    con = duckdb.connect()
    register_views(con, sf_dir)

    # RAW registry, not entrymod.queries(): the instrumented wrappers would
    # run the _FINGERPRINT_QUERIES' Spark job + oracle SQL a second time
    # each at the correctness SF (the sidecars below already capture both
    # fingerprints)
    reg = entrymod._registry()
    qs = reg.queries
    oracles = reg.oracles
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                if n == 0:
                    # the driver's rows-only gate records rows>0 — an empty
                    # result must go red here too, not just on the driver
                    print(f"FAIL  {name}: rows-only query returned 0 rows")
                    n_fail += 1
                    continue
                print(f"rows  {name}: {n} rows (rows-only, no oracle) [{time.time()-t0:.1f}s]")
                n_rowsonly += 1
                continue
            # sidecar always on: full-sweep reds must leave a DIAG artifact
            # (r2 ask)
            problems = compare_query(
                sdf, con, oracles[name], sidecar=name + sidecar_suffix
            )
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name} [{time.time()-t0:.1f}s]")
            n_pass += 1
    con.close()
    return n_pass, n_fail, n_rowsonly


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--bare"]
    bare = "--bare" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    unknown = only - set(entrymod._registry().queries)
    if unknown:
        # a typo'd name silently matching nothing would print '0 pass,
        # 0 fail' and exit 0 — fail loudly instead
        print(f"ERROR unknown query names: {sorted(unknown)}")
        return 2

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    if bare:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master(f"local[{cpus}]").getOrCreate()
    else:
        from big_data_analytics_machine_learning_poc_spark.session import get_session

        spark = get_session("compare", cpus=cpus)
    n_pass, n_fail, n_rowsonly = sweep(spark, sf_dir, only)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
