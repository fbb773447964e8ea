"""Property-based tests (hypothesis) for the exactness and ordering
machinery everything else rests on."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

money = st.decimals(
    min_value=-999_999, max_value=999_999, places=2, allow_nan=False, allow_infinity=False
)


@settings(max_examples=8, deadline=None)
@given(st.lists(money, min_size=1, max_size=200))
def test_cents_sum_is_exact(spark, values):
    """sum via cents == exact decimal sum for any 2-decimal inputs, any
    partitioning."""
    from pyspark.sql import functions as F

    from big_data_analytics_machine_learning_poc_spark.functions.exact import cents

    floats = [(float(v),) for v in values]
    df = spark.createDataFrame(floats, ["x"]).repartition(7)
    got = df.agg((F.sum(cents("x")) / F.lit(100.0)).alias("s")).collect()[0].s
    expect = float(sum(values))
    assert abs(got - expect) < 1e-9


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000), st.integers(0, 100)),
        min_size=1,
        max_size=60,
    )
)
def test_asof_join_matches_bruteforce(spark, rows):
    """asof_join == per-row python brute force on arbitrary (key, ts) data.
    Right rows double as left probes so equal-ts inclusivity is exercised."""
    from big_data_analytics_machine_learning_poc_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    left_rows = [
        (k, base + dt.timedelta(seconds=ts_off), i)
        for i, (k, ts_off, _) in enumerate(rows)
    ]
    right_rows = [
        (k, base + dt.timedelta(seconds=ts_off + (v % 7) - 3), v)
        for (k, ts_off, v) in rows
    ]
    left = spark.createDataFrame(left_rows, ["k", "ts", "row_id"])
    right = spark.createDataFrame(right_rows, ["k", "ts", "v"])

    got = {r.row_id: r.asof_value for r in asof_join(left, right, "k", "ts", "v").collect()}

    # brute force: max right value among (same k, right.ts <= left.ts),
    # tie on ts → the one last() would see: ordering among equal (k, ts)
    # right rows is arbitrary, so only compare when the answer is unique
    for k, lts, row_id in left_rows:
        candidates = [(rts, v) for (rk, rts, v) in right_rows if rk == k and rts <= lts]
        if not candidates:
            assert got[row_id] is None
            continue
        best_ts = max(rts for rts, _ in candidates)
        best_vals = {v for rts, v in candidates if rts == best_ts}
        assert got[row_id] in best_vals


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="abcde ", min_size=0, max_size=40), min_size=1, max_size=30))
def test_minhash_signature_set_semantics(spark, texts):
    """Minhash is a function of the token SET: permuting tokens or repeating
    them must not change the signature."""
    from pyspark.sql import functions as F

    from big_data_analytics_machine_learning_poc_spark.functions.hashing import (
        MERSENNE_P,
        MINHASH_PERMS,
        md5_hash32,
    )

    rows = []
    for i, t in enumerate(texts):
        toks = t.split()
        rows.append((2 * i, " ".join(toks)))
        rows.append((2 * i + 1, " ".join(list(reversed(toks)) + toks)))  # permuted + doubled
    df = spark.createDataFrame(rows, ["doc_id", "text"]).filter(F.trim("text") != "")
    th = (
        df.select("doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
        .select("doc_id", md5_hash32(F.col("tok")).alias("h"))
        .distinct()
    )
    a, b = MINHASH_PERMS[0]
    sig = {
        r.doc_id: r.mh
        for r in th.groupBy("doc_id")
        .agg(F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)).alias("mh"))
        .collect()
    }
    for i in range(len(texts)):
        if 2 * i in sig and 2 * i + 1 in sig:
            assert sig[2 * i] == sig[2 * i + 1]


def test_fingerprint_split_partition_invariant(spark):
    """The content-hash split must assign identical rows identically under
    any partitioning (the property seeded randomSplit lacks)."""
    from big_data_analytics_machine_learning_poc_spark.operators.corpus import (
        corpus_split_by_fingerprint,
    )

    SF = "/root/testdata/sf0.001"
    a = {
        (r.lang, r.split): r.n_docs
        for r in corpus_split_by_fingerprint(spark, SF).collect()
    }
    # rerun: assignment is a pure function of content, not of partitioning,
    # task order, or session state
    b = {
        (r.lang, r.split): r.n_docs
        for r in corpus_split_by_fingerprint(spark, SF).collect()
    }
    assert a == b
    total = sum(a.values())
    train = sum(n for (_, s), n in a.items() if s == "train")
    assert 0.6 < train / total < 0.95  # ~80% by construction


def test_pack_sequences_conserves_tokens(spark):
    """Packing must neither drop nor double-count tokens: the sum over all
    (lang, seq) windows equals the corpus token total, and every window but
    a shard's last respects the budget's doc-boundary overflow rule."""
    from pyspark.sql import functions as F

    from big_data_analytics_machine_learning_poc_spark.catalog import load_table
    from big_data_analytics_machine_learning_poc_spark.operators.corpus import (
        corpus_pack_sequences,
    )
    from big_data_analytics_machine_learning_poc_spark.operators.text import tokens_col

    SF = "/root/testdata/sf0.001"
    packed = corpus_pack_sequences(spark, SF)
    got = packed.agg(F.sum("n_tokens")).collect()[0][0]
    expect = (
        load_table(spark, SF, "documents")
        .select(F.size(tokens_col()).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert got == expect


def test_scd2_intervals_tile_the_timeline(spark):
    """SCD2 invariants on real data: per user, intervals are disjoint,
    adjacent (valid_to == next valid_from), exactly one open interval, and
    n_events conserves the user's event count."""
    from big_data_analytics_machine_learning_poc_spark.catalog import load_table
    from big_data_analytics_machine_learning_poc_spark.operators.streaming_ops import (
        scd2_user_state,
    )

    sf = "/root/testdata/sf0.001"
    rows = scd2_user_state(spark, sf).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)

    ev_counts = {
        r.user_id: r.n
        for r in load_table(spark, sf, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(by_user) == set(ev_counts)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(r.n_events for r in ivs) == ev_counts[uid]
        assert [r.is_current for r in ivs].count(1) == 1 and ivs[-1].is_current == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from  # adjacent, no gaps/overlaps
            assert a.event_type != b.event_type  # runs are maximal


_delta_op = st.one_of(
    st.tuples(st.just("overwrite"), st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), max_size=12)),
    st.tuples(st.just("append"), st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), max_size=12)),
    st.tuples(st.just("delete_le"), st.integers(0, 9)),
    st.tuples(st.just("delete_dv"), st.integers(0, 9)),
    st.tuples(st.just("update_cow"), st.tuples(st.integers(0, 9), st.integers(1, 50))),
    st.tuples(st.just("update_dv"), st.tuples(st.integers(0, 9), st.integers(1, 50))),
    st.tuples(st.just("merge"), st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=1, max_size=6)),
    st.tuples(st.just("merge_clauses"), st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=1, max_size=6)),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("zorder"), st.just(None)),
    st.tuples(st.just("purge"), st.just(None)),
    st.tuples(st.just("checkpoint"), st.just(None)),
    st.tuples(st.just("restore"), st.integers(0, 4)),
    st.tuples(st.just("rename_roundtrip"), st.just(None)),
    st.tuples(st.just("enable_cdf"), st.just(None)),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_delta_op, min_size=1, max_size=5))
def test_delta_lite_model_based(spark, ops):
    """Model check for the Delta lane: an arbitrary sequence of
    overwrite / append / DELETE (cow + deletion-vector) / UPDATE (cow +
    merge-on-read) / MERGE / OPTIMIZE / REORG-PURGE / checkpoint /
    RESTORE / column-mapping-rename commits must leave every SNAPSHOT
    (current and time-traveled) equal to a pure Python list-of-rows
    model, and vacuum(0) must never change the latest snapshot. Covers
    the interactions no example-based test enumerates: merge-after-
    dv-delete, purge between checkpoints, dv-update on a dv-deleted file,
    restore across DV transitions, renamed schema under every op, etc."""
    import shutil
    import tempfile

    from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
        checkpoint_table,
        compact_table,
        delete_where,
        enable_column_mapping,
        merge_delta,
        purge_deletion_vectors,
        read_delta,
        rename_column,
        update_where,
        vacuum_table,
        write_delta,
    )

    schema = "id long, val long"

    def df_of(rows):
        return spark.createDataFrame([tuple(r) for r in rows], schema=schema)

    table = tempfile.mkdtemp(prefix="dprop_")
    shutil.rmtree(table)  # write_delta creates it
    model: list[tuple[int, int]] = []
    by_version: dict[int, list[tuple[int, int]]] = {}
    created = False
    try:
        for kind, arg in ops:
            if not created and kind not in ("overwrite", "append"):
                continue  # table must exist first
            if kind == "overwrite":
                v = write_delta(df_of(arg), table, mode="overwrite")
                model = list(arg)
                created = True
            elif kind == "append":
                v = write_delta(df_of(arg), table, mode="append" if created else "overwrite")
                model = model + list(arg)
                created = True
            elif kind == "delete_le":
                v = delete_where(spark, table, f"id <= {arg}")
                model = [r for r in model if r[0] > arg]
                if v is None:
                    continue
            elif kind == "delete_dv":
                v = delete_where(spark, table, f"id <= {arg}", mode="dv")
                model = [r for r in model if r[0] > arg]
                if v is None:
                    continue
            elif kind in ("update_cow", "update_dv"):
                k, d = arg
                v = update_where(
                    spark,
                    table,
                    {"val": f"val + {d}"},
                    f"id <= {k}",
                    mode="dv" if kind == "update_dv" else "cow",
                )
                model = [(r[0], r[1] + d) if r[0] <= k else r for r in model]
                if v is None:
                    continue
            elif kind == "zorder":
                from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
                    optimize_zorder,
                )

                v = optimize_zorder(spark, table, ["id"], n_files=2)
                if v is None:
                    continue
            elif kind == "purge":
                v = purge_deletion_vectors(spark, table)
                if v is None:
                    continue
            elif kind == "enable_cdf":
                # snapshots are CDF-invariant; the op makes every LATER
                # DML in the sequence also stage typed change files, so
                # the model exercises cdc-action composition with all ops
                from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
                    enable_change_data_feed,
                )

                try:
                    v = enable_change_data_feed(table)
                except ValueError:
                    continue  # already enabled
            elif kind == "rename_roundtrip":
                # metadata-only schema evolution interleaved with DML:
                # val -> tmpv -> val nets the original logical schema, so
                # the model stays valid; the intermediate commits are NOT
                # recorded (their snapshot has a different column name)
                try:
                    enable_column_mapping(table)
                except ValueError:
                    pass  # already enabled by an earlier rename op
                rename_column(table, "val", "tmpv")
                v = rename_column(table, "tmpv", "val")
            elif kind == "merge":
                src = list({r[0]: r for r in arg}.values())  # unique keys
                v = merge_delta(spark, table, df_of(src), ["id"])
                keys = {r[0] for r in src}
                model = [r for r in model if r[0] not in keys] + src
            elif kind == "merge_clauses":
                # WHEN-clause MERGE (r12): first-match-wins per matched
                # target ROW — interplay with dv-deletes, restore, rename
                # and whatever file layout prior ops left behind (the r11
                # cross-file duplication class)
                src = list({r[0]: r for r in arg}.values())
                sv = dict(src)
                v = merge_delta(
                    spark, table, df_of(src), ["id"],
                    when_matched=[
                        ("t.val < 50", "delete"),
                        ("s.val % 2 = 0", {"update": {"val": "s.val"}}),
                    ],
                    when_not_matched_insert="val >= 10",
                )
                tkeys = {r[0] for r in model}
                nm = []
                for r in model:
                    if r[0] not in sv:
                        nm.append(r)
                    elif r[1] < 50:
                        pass  # clause 0: delete
                    elif sv[r[0]] % 2 == 0:
                        nm.append((r[0], sv[r[0]]))  # clause 1: update
                    else:
                        nm.append(r)  # matched, no clause: untouched
                model = nm + [
                    (k, val) for k, val in src if k not in tkeys and val >= 10
                ]
            elif kind == "compact":
                v = compact_table(spark, table)
                if v is None:
                    continue
            elif kind == "restore":
                # restore to the arg-th recorded version (mod history);
                # model snaps back to that version's rows
                if not by_version:
                    continue
                targets = sorted(by_version)
                tv = targets[arg % len(targets)]
                from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
                    restore_table,
                )

                v = restore_table(spark, table, tv)
                model = list(by_version[tv])
            else:  # checkpoint — no new version
                checkpoint_table(table)
                continue
            by_version[v] = list(model)
        if not created:
            return
        for v, expect in by_version.items():
            got = [(r.id, r.val) for r in read_delta(spark, table, version=v).collect()]
            assert sorted(got) == sorted(expect), f"version {v}"
            # the Python DataSource connector must see the identical
            # snapshot through versionAsOf (same log, independent reader)
            from big_data_analytics_machine_learning_poc_spark.sources.pyds import (
                DeltaLiteDataSource,
            )

            spark.dataSource.register(DeltaLiteDataSource)
            via_pyds = [
                (r.id, r.val)
                for r in spark.read.format("delta_lite")
                .option("versionAsOf", str(v))
                .load(table)
                .collect()
            ]
            assert sorted(via_pyds) == sorted(expect), f"pyds version {v}"
        # snapshot_diff: for each adjacent recorded pair, the net change
        # feed must transform the earlier model into the later one as
        # MULTISETS (delete rows all present before; inserts all present
        # after; old - deletes + inserts == new)
        from collections import Counter

        from big_data_analytics_machine_learning_poc_spark.sources.delta_lite import (
            snapshot_diff,
        )

        recorded = sorted(by_version)
        for v1, v2 in zip(recorded, recorded[1:]):
            changes = snapshot_diff(spark, table, v1, v2).collect()
            dels = Counter((r.id, r.val) for r in changes if r._change_type == "delete")
            ins = Counter((r.id, r.val) for r in changes if r._change_type == "insert")
            old_c = Counter(tuple(r) for r in by_version[v1])
            new_c = Counter(tuple(r) for r in by_version[v2])
            assert dels <= old_c, f"diff {v1}->{v2}: phantom delete"
            assert ins <= new_c, f"diff {v1}->{v2}: phantom insert"
            assert old_c - dels + ins == new_c, f"diff {v1}->{v2} doesn't replay"
        vacuum_table(table, retention_ms=0)
        latest = max(by_version)
        got = [(r.id, r.val) for r in read_delta(spark, table).collect()]
        assert sorted(got) == sorted(by_version[latest])
    finally:
        shutil.rmtree(table, ignore_errors=True)


def test_partitioned_prefix_sum_equals_global_window(spark):
    """The two-phase range-partitioned prefix sum (functions/prefix.py)
    must equal the single-task global-window form for unique order keys,
    at several partition counts (incl. more partitions than rows), with
    negative values, both inclusive and exclusive."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from big_data_analytics_machine_learning_poc_spark.functions.prefix import (
        partitioned_prefix_sum,
    )

    rng = random.Random(7)
    keys = rng.sample(range(100_000), 500)
    rows = [(k, rng.randint(-50, 50)) for k in keys]
    df = spark.createDataFrame(rows, "k long, v long")
    for hi, excl in ((0, False), (-1, True)):
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, hi)
        want = {
            r.k: r.c
            for r in df.withColumn(
                "c", F.coalesce(F.sum("v").over(w), F.lit(0))
            ).collect()
        }
        for parts in (1, 4, 32, 1000):
            got = {
                r.k: r.c
                for r in partitioned_prefix_sum(
                    df, "k", "v", "c", num_partitions=parts, exclusive=excl
                ).collect()
            }
            assert got == want, (parts, excl)


def test_partitioned_prefix_sums_fused_equals_stacked(spark):
    """The one-pass multi-value form (r12: parts_pareto_share fuses
    cum_cents + rnk into one range shuffle) must equal stacking
    single-value calls — including a lit(1) value (the row-number idiom)
    and mixed signs."""
    import random

    from pyspark.sql import functions as F

    from big_data_analytics_machine_learning_poc_spark.functions.prefix import (
        partitioned_prefix_sum,
        partitioned_prefix_sums,
    )

    rng = random.Random(13)
    keys = rng.sample(range(100_000), 400)
    rows = [(k, rng.randint(-50, 50), rng.randint(0, 9)) for k in keys]
    df = spark.createDataFrame(rows, "k long, v long, u long")
    stacked = partitioned_prefix_sum(
        partitioned_prefix_sum(
            partitioned_prefix_sum(df, "k", "v", "cv", 16),
            "k",
            "u",
            "cu",
            16,
        ),
        "k",
        F.lit(1),
        "rn",
        16,
    )
    fused = partitioned_prefix_sums(
        df, "k", [("v", "cv"), ("u", "cu"), (F.lit(1), "rn")], 16
    )
    want = {r.k: (r.cv, r.cu, r.rn) for r in stacked.collect()}
    got = {r.k: (r.cv, r.cu, r.rn) for r in fused.collect()}
    assert got == want


def test_partitioned_prefix_sum_check_unique_guard(spark):
    """check_unique makes the duplicate-order-key contract loud."""
    import pytest as _pytest

    from big_data_analytics_machine_learning_poc_spark.functions.prefix import (
        partitioned_prefix_sum,
    )

    df = spark.createDataFrame([(1, 10), (1, 20), (2, 30)], "k long, v long")
    with _pytest.raises(ValueError, match="duplicate"):
        partitioned_prefix_sum(df, "k", "v", "c", check_unique=True)
    ok = partitioned_prefix_sum(
        df.dropDuplicates(["k"]), "k", "v", "c", check_unique=True
    )
    assert ok.count() == 2


# ---------------------------------------------------------------------------
# Mining lanes (operators/mining.py): the factored production cores vs
# brute-force references on random inputs
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=8),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([(1, 2), (3, 5), (4, 5), (19, 20)]),
)
def test_prefix_filter_join_equals_bruteforce(spark, docs, thresh):
    """Zero-false-negative/zero-false-positive property of the AllPairs
    prefix-filter join (dictionary encoding + length filter + prefix
    candidates) on random small corpora at several thresholds."""
    from big_data_analytics_machine_learning_poc_spark.operators.mining import (
        prefix_filter_pairs_frame,
    )

    num, den = thresh
    sets = {i: set(toks) for i, toks in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in sets.items()],
        "doc_id long, toks array<string>",
    )
    got = {
        (r["a_id"], r["b_id"]): (r["inter_tokens"], r["union_tokens"])
        for r in prefix_filter_pairs_frame(df, num, den).collect()
    }
    want = {}
    ids = sorted(sets)
    for x in ids:
        for y in ids:
            if x < y:
                i = len(sets[x] & sets[y])
                u = len(sets[x] | sets[y])
                if den * i >= num * u:
                    want[(x, y)] = (i, u)
    assert got == want
    # the 8-token alphabet above runs the ≤63-id BITSET verify; pad the
    # vocabulary past 64 with singleton-token docs (they can't create new
    # qualifying pairs among THEMSELVES at t ≥ 1/2, and their token sets
    # are disjoint from the a-h alphabet) to force the open-vocab
    # array_intersect path — both paths must emit the identical pair set
    if num * 2 >= den:  # singleton pairs J∈{0,1}: only identical dup-safe
        pad = [(100 + k, [f"pad_tok_{k}"]) for k in range(70)]
        # two WIDE multi-token docs sharing all 70 pad tokens: the r7
        # scalecurve harness caught the old unconditional bitset-mask agg
        # overflowing int64 on exactly this shape (a single doc whose
        # dictionary ids span > 64 ranks sums duplicate mod-64 bits —
        # singleton pads could never trigger it); they must pair with each
        # other at J=1 and with nothing else (J=1/70 vs singletons,
        # disjoint vs the a-h alphabet)
        pad += [(200, [f"pad_tok_{k}" for k in range(70)]),
                (201, [f"pad_tok_{k}" for k in range(70)])]
        df_wide = df.unionByName(
            spark.createDataFrame(pad, "doc_id long, toks array<string>")
        )
        got_wide = {
            (r["a_id"], r["b_id"]): (r["inter_tokens"], r["union_tokens"])
            for r in prefix_filter_pairs_frame(df_wide, num, den).collect()
        }
        assert got_wide == {**want, (200, 201): (70, 70)}


@settings(max_examples=8, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_triangle_census_equals_bruteforce(spark, edges):
    """Degree-ordered triangle census == brute enumeration on random
    graphs (including hubs, isolated stars, and multi-component shapes)."""
    import itertools as it

    from big_data_analytics_machine_learning_poc_spark.operators.mining import (
        triangle_census_frame,
    )

    df = spark.createDataFrame(sorted(edges), "p1 long, p2 long")
    row = triangle_census_frame(df).collect()[0]
    nodes = sorted({n for e in edges for n in e})
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        1
        for a, b, c in it.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == wedges
    if wedges:
        assert row["global_clustering"] == round(3 * tri / wedges, 6)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from(["red fox", "blue sky", "tall tree", "old dog", "wet rain"]),
                     min_size=2, max_size=5),
            st.booleans(),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_incremental_pairs_equal_full_sweep_restricted(spark, corpus):
    """The incremental lane's batch-restricted candidate generation loses
    nothing: pairs touching the batch == the FULL pair sweep filtered to
    batch-touching pairs, on random phrase corpora (same geometry, same
    threshold). This is the no-false-negative property that justifies
    never re-paying corpus x corpus at ingest."""
    import pyspark.sql.functions as F

    from big_data_analytics_machine_learning_poc_spark.operators.dedup import (
        ORACLE_PERMS,
        ORACLE_ROWS_PER_BAND,
        doc_shingle_hashes_from,
        incremental_minhash_pairs,
        minhash_candidate_pairs,
        minhash_signatures_from,
    )

    rows = [
        (i, " ".join(phrases), "new" if is_new else "old")
        for i, (phrases, is_new) in enumerate(corpus)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r.doc_a, r.doc_b): (r.est_jaccard, r.pair_kind)
        for r in incremental_minhash_pairs(docs, F.col("source") == "new").collect()
    }
    # full sweep at identical geometry/threshold, then restrict
    sig = minhash_signatures_from(doc_shingle_hashes_from(docs), ORACLE_PERMS)
    cand = minhash_candidate_pairs(sig, len(ORACLE_PERMS), ORACLE_ROWS_PER_BAND)
    sa, sb = sig.alias("sa"), sig.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(len(ORACLE_PERMS))
    )
    est = matches.cast("double") / F.lit(len(ORACLE_PERMS))
    full = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(est >= 0.5)
        .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .collect()
    }
    new_ids = {i for i, (_, is_new) in enumerate(corpus) if is_new}
    want = {
        p: e for p, e in full.items() if p[0] in new_ids or p[1] in new_ids
    }
    assert {p: e for p, (e, _) in got.items()} == want
    for (a, b), (_, kind) in got.items():
        assert kind == ("new_new" if a in new_ids and b in new_ids else "new_old")
