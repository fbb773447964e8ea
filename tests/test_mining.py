"""Planted-data tests for the mining lanes (operators/mining.py).

Each lane runs the REAL registered function against a tiny parquet sf-dir
with hand-computable positives, pinning the semantic branches the sf-table
compare can't isolate: join (not row-lag) alignment in the forecast, bucket
boundary ownership in the histogram, the support threshold and lift algebra
in the rules, the exact-threshold boundary and zero-false-negative claim in
the prefix-filter join, and the full triangle/wedge census on a known graph.
"""

from __future__ import annotations

import datetime
import itertools
import os

import pytest
from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.operators import mining


def _ts(day: int, i: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 3, day, 8, 0, i % 60)


@pytest.fixture(scope="module")
def mining_sf(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mining_sf"))

    # events — type "a": 10/day on days 1..7, 13/day on days 8..14;
    # type "b": day d has d events for d in 1..8 and 10 (day 9 MISSING —
    # the gap that distinguishes a day-join from a row-lag).
    rows = []
    eid = itertools.count()
    for d in range(1, 15):
        for i in range(10 if d <= 7 else 13):
            rows.append((next(eid), _ts(d, i), i, "a", 1.0, None))
    for d in [*range(1, 9), 10]:
        for i in range(d):
            rows.append((next(eid), _ts(d, i), i, "b", 1.0, None))
    # conversion-latency plants: user 100 converts in 30 s, user 102 in
    # 90 s; user 101's only purchase PRECEDES their first view (excluded).
    rows += [
        (next(eid), datetime.datetime(2024, 3, 20, 8, 0, 0), 100, "view", 1.0, None),
        (next(eid), datetime.datetime(2024, 3, 20, 8, 0, 30), 100, "purchase", 1.0, None),
        (next(eid), datetime.datetime(2024, 3, 20, 9, 0, 0), 101, "purchase", 1.0, None),
        (next(eid), datetime.datetime(2024, 3, 21, 9, 0, 0), 101, "view", 1.0, None),
        (next(eid), datetime.datetime(2024, 3, 22, 8, 0, 0), 102, "view", 1.0, None),
        (next(eid), datetime.datetime(2024, 3, 22, 8, 1, 30), 102, "purchase", 1.0, None),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )

    # orders — bucket boundary: $24 999.99 stays in bucket 0, $25 000.00
    # opens bucket 1.
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 0.01, _ts(1), "1-URGENT"),
            (2, 1, "O", 24999.99, _ts(1), "1-URGENT"),
            (3, 1, "O", 25000.00, _ts(1), "1-URGENT"),
            (4, 1, "O", 74999.99, _ts(1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )

    # lineitem — two planted graphs in one table:
    #   rules orders 1..4 on parts 101..103 (A=101, B=102, C=103):
    #     {A,B,C}, {A,B}, {A,B}, {C}  → pair (A,B) support 3, others 1
    #   triangle orders 11..18 on parts 201..204: edges AB, BC, AC, CD each
    #     in exactly 2 orders → K3 plus a pendant edge.
    baskets = {
        1: [101, 102, 103],
        2: [101, 102],
        3: [101, 102],
        4: [103],
        11: [201, 202],
        12: [201, 202],
        13: [202, 203],
        14: [202, 203],
        15: [201, 203],
        16: [201, 203],
        17: [203, 204],
        18: [203, 204],
    }
    lineitem = spark.createDataFrame(
        [
            (ok, pk, 1, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _ts(1))
            for ok, parts in baskets.items()
            for i, pk in enumerate(parts)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )

    # documents — A (20 tokens) ⊃ B (19 of them): J = 19/20 = 0.95 exactly
    # (boundary, kept); C shares 10 of A's 20 (J = 1/3, dropped); D is an
    # exact dup of B (J = 1.0, kept).
    toks = [f"t{i:02d}" for i in range(20)]
    docs = spark.createDataFrame(
        [
            (0, " ".join(toks), "en", "s", 0),
            (1, " ".join(toks[:19]), "en", "s", 0),
            (2, " ".join(toks[:10] + [f"x{i}" for i in range(10)]), "en", "s", 0),
            (3, " ".join(toks[:19]), "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    for name, df in [
        ("events", events),
        ("orders", orders),
        ("lineitem", lineitem),
        ("documents", docs),
    ]:
        if name == "events":
            # the streaming source's pathGlobFilter matches leaf FILES, so
            # events.parquet must be a single file like the driver testdata,
            # not a directory of part files
            import glob
            import shutil

            staging = os.path.join(root, "_events_staging")
            df.coalesce(1).write.mode("overwrite").parquet(staging)
            part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
            shutil.copy(part, os.path.join(root, "events.parquet"))
            shutil.rmtree(staging)
        else:
            df.write.mode("overwrite").parquet(
                os.path.join(root, f"{name}.parquet")
            )
    return root


def test_seasonal_naive_scores_days_not_rows(spark, mining_sf):
    out = {
        r["event_type"]: r
        for r in mining.events_seasonal_naive_forecast(spark, mining_sf).collect()
    }
    # type a: days 8..14 scored, each |13 - 10| = 3
    a = out["a"]
    assert (a["n_days_scored"], a["total_abs_err"], a["total_actual"]) == (7, 21, 91)
    assert a["mae"] == 3.0
    assert a["wape"] == round(21 / 91, 6)
    # type b: only days 8 (vs day 1) and 10 (vs day 3) have a 7-days-prior
    # observation. A row-lag(7) over the gapped series would have paired
    # day 10 with day 2 (err 8) instead of day 3 (err 7).
    b = out["b"]
    assert (b["n_days_scored"], b["total_abs_err"], b["total_actual"]) == (2, 14, 18)


def test_price_histogram_bucket_boundaries(spark, mining_sf):
    rows = {r["bucket"]: r for r in mining.orders_price_histogram(spark, mining_sf).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["n_orders"] == 2  # $0.01 and $24 999.99
    assert rows[0]["lo_dollars"] == 0
    assert rows[1]["n_orders"] == 1  # $25 000.00 exactly — owned by bucket 1
    assert rows[1]["lo_dollars"] == 25000
    assert rows[2]["n_orders"] == 1
    assert rows[0]["revenue"] == 25000.0


def test_association_rules_threshold_and_lift(spark, mining_sf):
    out = mining.basket_association_rules(spark, mining_sf).collect()
    # only the (101,102) pair reaches support 3; both directions emitted
    assert {(r["antecedent"], r["consequent"]) for r in out} == {(101, 102), (102, 101)}
    r = next(r for r in out if r["antecedent"] == 101)
    assert r["pair_support"] == 3
    # A and B each appear in 3 of the 12 baskets → conf 1.0, lift 3·12/(3·3)
    assert r["antecedent_support"] == 3 and r["consequent_support"] == 3
    assert r["confidence"] == 1.0
    assert r["lift"] == 4.0


def test_prefix_filter_exact_boundary_and_no_false_negatives(spark, mining_sf):
    out = {
        (r["a_id"], r["b_id"]): r
        for r in mining.dedup_prefix_filter_pairs(spark, mining_sf).collect()
    }
    # J(0,1) = 19/20 = 0.95 — the >= boundary is KEPT; (1,3) exact dups;
    # J(0,3) = 0.95 again; doc 2 (J = 1/3 with 0) never qualifies.
    assert set(out) == {(0, 1), (0, 3), (1, 3)}
    assert out[(0, 1)]["inter_tokens"] == 19 and out[(0, 1)]["union_tokens"] == 20
    assert out[(1, 3)]["jaccard"] == 1.0
    # zero-false-negative audit: brute-force all pairs in python
    docs = {
        r["doc_id"]: set(r["text"].split())
        for r in spark.read.parquet(os.path.join(mining_sf, "documents.parquet")).collect()
    }
    brute = set()
    for x, y in itertools.combinations(sorted(docs), 2):
        i, u = len(docs[x] & docs[y]), len(docs[x] | docs[y])
        if 20 * i >= 19 * u:
            brute.add((x, y))
    assert set(out) == brute


def test_quantile_binning_boundaries(spark, mining_sf):
    # cents = [1, 2499999, 2500000, 7499999]; interpolated quartiles put
    # exactly one order in each bin
    rows = {r["bin"]: r for r in mining.orders_quantile_binning(spark, mining_sf).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert all(rows[b]["n_orders"] == 1 for b in rows)
    assert rows[3]["revenue"] == 74999.99


def test_conversion_latency_ordered_and_exact(spark, mining_sf):
    row = mining.events_conversion_latency(spark, mining_sf).collect()[0]
    # users 100 (30 s) and 102 (90 s) convert; 101's purchase-before-view
    # must NOT count
    assert row["n_converted"] == 2
    assert row["mean_latency_s"] == 60.0
    assert row["p50_latency_s"] == 60.0
    assert row["p90_latency_s"] == 84.0  # 30 + 0.9·(90−30)


def test_keyword_topk_ranks_by_tf_over_df(spark, mining_sf):
    out = mining.docs_keyword_topk(spark, mining_sf).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["tok"])
    # doc 0: t19 is unique to it (df=1 → score 1.0); t10..t18 (df=3,
    # score 1/3) beat t00..t09 (df=4); ties break on token
    assert by_doc[0] == ["t19", "t10", "t11"]
    # doc 2's x-tokens are unique to it
    assert by_doc[2] == ["x0", "x1", "x2"]
    assert all(len(v) == 3 for v in by_doc.values())


def test_window_value_funcs_full_frame(spark, mining_sf):
    rows = {r["o_custkey"]: r for r in mining.window_value_funcs(spark, mining_sf).collect()}
    r = rows[1]
    # 4 orders, same date — ordered by o_orderkey: first/second/last pinned
    assert r["n_orders"] == 4
    assert r["first_price"] == 0.01
    assert r["second_price"] == 24999.99
    # last_value must see the FULL frame, not default ..CURRENT ROW
    assert r["last_price"] == 74999.99


def test_triangle_census_on_known_graph(spark, mining_sf):
    # The lane sees BOTH planted blocks: the triangle block's four edges
    # (parts 2xx) plus the rules block's (101,102) support-3 edge.
    row = mining.graph_triangle_parts(spark, mining_sf).collect()[0]
    # edges: AB, BC, AC, CD (2xx block) + (101,102) from the rules block
    # → one triangle; degrees: 101:1, 102:1, 201:2, 202:2, 203:3, 204:1
    # → wedges = 1+1+3 = 5; clustering = 3·1/5
    assert row["n_nodes"] == 6
    assert row["n_edges"] == 5
    assert row["n_triangles"] == 1
    assert row["n_wedges"] == 5
    assert row["global_clustering"] == 0.6


def test_dow_seasonality_alignment(spark, mining_sf):
    out = [
        r
        for r in mining.events_dow_seasonality(spark, mining_sf).collect()
        if r["event_type"] == "b"
    ]
    by_dow = {r["dow"]: r["n_events"] for r in out}
    # type b plants count=d on 2024-03-d for d in 1..8,10; 2024-03-03 and
    # 03-10 are Sundays (Spark dow=1) -> 3+10; 03-01/03-08 Fridays (dow=6)
    assert by_dow[1] == 13
    assert by_dow[6] == 9
    assert set(by_dow) <= set(range(1, 8))
    total = sum(by_dow.values())
    assert total == 46
    for r in out:
        assert r["share_of_type"] == round(r["n_events"] / total, 6)


def test_group_order_by_all_resolution(spark, mining_sf):
    out = mining.sql_group_order_by_all(spark, mining_sf).collect()
    # all four planted orders share status/priority -> ONE group
    assert len(out) == 1
    assert out[0]["n_orders"] == 4
    assert out[0]["revenue"] == 124999.99


def test_rfm_single_customer_cell(spark, mining_sf):
    out = mining.customer_rfm_segments(spark, mining_sf).collect()
    # one customer: recency 0 <= median -> 2; freq/cents equal their own
    # median (strict > is False) -> 1
    assert len(out) == 1
    r = out[0]
    assert (r["r_score"], r["f_score"], r["m_score"]) == (2, 1, 1)
    assert r["n_customers"] == 1
    assert r["segment_revenue"] == 124999.99


def test_fpgrowth_matches_apriori_reference(spark, mining_sf):
    # items is the driver-boundary string form (comma-joined sorted ids);
    # parse it back to the tuple the reference enumeration produces
    got = {
        tuple(int(x) for x in r["items"].split(",")): r["freq"]
        for r in mining.ml_fpgrowth_itemsets(spark, mining_sf).collect()
    }
    # independent pure-python enumeration over the SAME parquet baskets
    rows = spark.read.parquet(os.path.join(mining_sf, "lineitem.parquet")).collect()
    baskets = {}
    for r in rows:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    from collections import Counter

    ref = Counter()
    for items in baskets.values():
        s = sorted(items)
        for size in range(1, len(s) + 1):
            for combo in itertools.combinations(s, size):
                ref[combo] += 1
    minc = max(1, -(-len(baskets) * 2 // 10000))  # ceil(0.0002 * n)
    ref = {k: v for k, v in ref.items() if v >= minc}
    assert got == ref
    # cross-lane parity: every size-2 itemset's freq equals the exact
    # pair_support of basket_association_rules (direction antecedent<cons)
    rules = {
        (r["antecedent"], r["consequent"]): r["pair_support"]
        for r in mining.basket_association_rules(spark, mining_sf).collect()
    }
    for (a, b), support in rules.items():
        if a < b:
            assert got.get((a, b)) == support


def test_stream_topk_users_matches_batch_semantics(spark, mining_sf):
    out = mining.stream_topk_users_per_window(spark, mining_sf).collect()
    epoch = int(
        datetime.datetime(
            2024, 3, 5, 8, 0, tzinfo=datetime.timezone.utc
        ).timestamp()
    )
    win = [r for r in out if r["window_start_epoch"] == epoch]
    # 2024-03-05 08:00 window: type a users 0..9 (1 each) + type b users
    # 0..4 (1 each) -> users 0..4 have n=2; deterministic ties by user_id
    assert [(r["rk"], r["user_id"], r["n"]) for r in win] == [
        (1, 0, 2),
        (2, 1, 2),
        (3, 2, 2),
    ]
    assert all(r["rk"] <= 3 for r in out)


def test_pca_matches_numpy_reference(spark):
    import numpy as np

    lane = mining.emb_pca_covariance(spark, "/root/testdata/sf0.001").collect()
    X = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(
                "/root/testdata/sf0.001/embeddings.parquet"
            ).collect()
        ],
        dtype="float64",
    )
    cov = np.cov(X, rowvar=False, ddof=0)
    evals = np.linalg.eigvalsh(cov)[::-1]
    evr = evals / evals.sum()
    for r in lane:
        c = r["component"] - 1
        assert abs(r["eigenvalue"] - evals[c]) < 1e-6 * max(1.0, abs(evals[c]))
        assert abs(r["evr"] - evr[c]) < 1e-5
    assert [r["component"] for r in lane] == [1, 2, 3, 4]
    # eigenvalues descending, cum_evr monotone
    assert all(lane[i]["eigenvalue"] >= lane[i + 1]["eigenvalue"] for i in range(3))
    assert all(lane[i]["cum_evr"] <= lane[i + 1]["cum_evr"] for i in range(3))


def test_volume_anomaly_strict_threshold_and_gap(spark, mining_sf):
    out = {
        (r["event_type"], str(r["day"])): r
        for r in mining.dq_volume_anomaly(spark, mining_sf).collect()
    }
    # type b counts = day number on days 1..8,10
    assert out[("b", "2024-03-02")]["flagged"] is True  # 1 -> 2: 2*1 > 1
    assert out[("b", "2024-03-03")]["flagged"] is False  # 2 -> 3: 2*1 > 2 is strict-False
    gap = out[("b", "2024-03-10")]
    assert gap["prev_n"] == 8  # previous OBSERVED day (9 missing)
    assert gap["flagged"] is False  # |10-8|*2 = 4 > 8 is False
    # first observed day per type has no row
    assert ("b", "2024-03-01") not in out


def test_markov_transitions_funnel_cells(spark, mining_sf):
    out = {
        (r["cur"], r["nxt"]): r
        for r in mining.events_markov_transitions(spark, mining_sf).collect()
    }
    # users 100 and 102: view -> purchase; user 101: purchase -> view
    # (their purchase precedes their view); terminal events emit nothing
    assert out[("view", "purchase")]["n"] == 2
    assert out[("view", "purchase")]["prob"] == 1.0
    assert out[("purchase", "view")]["n"] == 1
    assert out[("purchase", "view")]["prob"] == 1.0
    # rows normalize: per cur, probs sum to ~1
    from collections import defaultdict

    sums = defaultdict(float)
    for (cur, _), r in out.items():
        sums[cur] += r["prob"]
    for cur, s in sums.items():
        assert abs(s - 1.0) < 1e-4, (cur, s)


def test_cohort_ltv_single_cohort(spark, mining_sf):
    out = mining.orders_cohort_ltv(spark, mining_sf).collect()
    # all four planted orders: customer 1, March 2024 -> one (cohort, 0) cell
    assert len(out) == 1
    r = out[0]
    assert r["cohort_month_idx"] == 2024 * 12 + 3
    assert r["month_age"] == 0
    assert (r["n_active"], r["n_orders"]) == (1, 4)
    assert r["revenue"] == 124999.99


def test_hhi_exact_shares(spark, tmp_path):
    # dedicated mini table: part 301 sourced 3:1 from two suppliers,
    # part 302 sole-sourced
    li = spark.createDataFrame(
        [
            (1, 301, 1, 1, 1.0, 15.0, 0.0, 0.0, "N", "O", _ts(1)),
            (2, 301, 1, 1, 1.0, 15.0, 0.0, 0.0, "N", "O", _ts(1)),
            (3, 301, 2, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _ts(1)),
            (4, 302, 7, 1, 1.0, 99.0, 0.0, 0.0, "N", "O", _ts(1)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    root = str(tmp_path)
    li.write.parquet(os.path.join(root, "lineitem.parquet"))
    rows = {
        r["l_partkey"]: r
        for r in mining.supplier_concentration_hhi(spark, root).collect()
    }
    # 302 sole-sourced: hhi 1.0 ranks first
    assert rows[302]["hhi"] == 1.0 and rows[302]["n_suppliers"] == 1
    # 301: shares 30/40 and 10/40 -> hhi = (900+100)/1600, top 0.75
    assert rows[301]["hhi"] == 0.625
    assert rows[301]["top_share"] == 0.75
    assert rows[301]["total_revenue"] == 40.0


def test_trigram_paths_end_truncation(spark, mining_sf):
    out = {r["path"]: r["n"] for r in mining.events_trigram_paths(spark, mining_sf).collect()}
    # users 100/102 have exactly 2 events (view, purchase) -> no trigram;
    # user 101 has 2 -> none. Type a/b interleavings dominate; just pin
    # that no path contains view or purchase (they never form trigrams)
    assert out
    assert all("view" not in p and "purchase" not in p for p in out)
    # every path has exactly 3 steps
    assert all(p.count(">") == 2 for p in out)


def test_interarrival_gaps_exact(spark, mining_sf):
    # all four planted orders share one date -> every gap is 0 days
    row = mining.orders_interarrival_stats(spark, mining_sf).collect()[0]
    assert row["n_gaps"] == 3
    assert row["mean_gap_days"] == 0.0
    assert row["p50_gap_days"] == 0.0


def test_gbt_spam_golden_accuracy(spark):
    out = {r["metric"]: r["value"] for r in mining.ml_gbt_spam(spark, "/root/testdata/sf0.001").collect()}
    assert out["gbt_accuracy"] > 0.8
    assert out["n_trees"] == 10.0
    assert abs(out["gbt_accuracy"] + out["gbt_test_error"] - 1.0) < 1e-9


def test_als_recommendation_contract(spark):
    rows = mining.ml_als_recommend(spark, "/root/testdata/sf0.001").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user"], []).append(r)
    assert by_user, "no recommendations produced"
    for user, recs in by_user.items():
        assert [r["rk"] for r in recs] == [1, 2, 3]
        scores = [r["score"] for r in recs]
        # scores finite and non-increasing in rank
        assert all(s == s and abs(s) < 1e6 for s in scores)
        assert scores == sorted(scores, reverse=True)
        assert len({r["item"] for r in recs}) == 3


def test_mining_plan_shapes(spark, mining_sf):
    """Plan assertions for the scale claims: top-k lanes plan
    TakeOrderedAndProject (no global sort), and the trigram lane's two
    lead() offsets collapse into ONE Window node."""
    from big_data_analytics_machine_learning_poc_spark.plans.explain import executed_plan

    hhi = executed_plan(mining.supplier_concentration_hhi(spark, mining_sf))
    assert "TakeOrderedAndProject" in hhi
    tri = executed_plan(mining.events_trigram_paths(spark, mining_sf))
    assert "TakeOrderedAndProject" in tri
    assert tri.count("Window") == 1
    rules = executed_plan(mining.basket_association_rules(spark, mining_sf))
    assert "CartesianProduct" not in rules
    # fixed-width histogram: single aggregate pair (partial+final), no join
    hist = executed_plan(mining.orders_price_histogram(spark, mining_sf))
    assert "Join" not in hist


def test_selfloop_report_ranks_repeaters(spark, mining_sf):
    out = mining.events_user_selfloop_report(spark, mining_sf).collect()
    assert out
    shares = [r["self_share"] for r in out]
    assert shares == sorted(shares, reverse=True)
    for r in out:
        assert 0.0 <= r["self_share"] <= 1.0
        assert r["n_self"] <= r["n_pairs"]
    # user 101's two events are purchase->view: 1 pair, 0 self
    u101 = [r for r in out if r["user_id"] == 101]
    if u101:
        assert u101[0]["self_share"] == 0.0


def test_cross_source_matrix_counts_match_pair_lane(spark, mining_sf):
    # the matrix must total exactly the pair lane's output (shared core)
    pairs = mining.dedup_prefix_filter_pairs(spark, mining_sf).collect()
    matrix = mining.dedup_cross_source_matrix(spark, mining_sf).collect()
    assert sum(r["n_pairs"] for r in matrix) == len(pairs)
    # fixture docs all share source 's' -> single within-source cell
    assert len(matrix) == 1
    assert matrix[0]["within_source"] is True
    assert (matrix[0]["source_x"], matrix[0]["source_y"]) == ("s", "s")
