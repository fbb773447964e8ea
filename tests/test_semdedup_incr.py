"""Incremental SemDeDup on planted clusters (VERDICT r9 ask #8).

Pins the two claims the rows-only lane cannot prove at the driver:

1. **Batch cost is corpus-size-independent**: the stored members entering
   any join are EXACTLY the batch's touched clusters' members — planting a
   large far-away cluster the batch never touches must leave the pruned
   frame unchanged (its members never appear), and growing that cluster
   must not grow the pair-join input.
2. **Drop semantics**: the paper's keep-low-centroid-similarity rule on
   batch-vs-corpus and batch-vs-batch pairs, with rerun-stable ties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_machine_learning_poc_spark.operators.semdedup_incr import (
    assign_to_centroids,
    fit_semdedup_index,
    incremental_semdedup,
)


def _unit(axis: int, dim: int = 8, scale: float = 1.0) -> list[float]:
    v = [0.0] * dim
    v[axis] = scale
    return v


def _near(axis: int, dim: int = 8, eps: float = 0.05) -> list[float]:
    v = _unit(axis, dim)
    v[(axis + 1) % dim] = eps
    return v


@pytest.fixture(scope="module")
def planted(spark):
    # corpus: cluster around axis 0 (ids 0-2), axis 3 (ids 10-12), and a
    # LARGE cluster around axis 6 (ids 100-119) the batch never touches
    rows = (
        [(i, _near(0, eps=0.01 * i)) for i in range(3)]
        + [(10 + i, _near(3, eps=0.01 * i)) for i in range(3)]
        + [(100 + i, _near(6, eps=0.002 * i)) for i in range(20)]
    )
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids, members = fit_semdedup_index(corpus, k=3, seed=7)
    return corpus, centroids, members


def test_assignment_matches_fit(spark, planted):
    """assign_to_centroids puts corpus vectors back in their own fitted
    clusters (euclidean-argmin parity with the KMeans model)."""
    corpus, centroids, members = planted
    re_assigned = assign_to_centroids(corpus, centroids).select("vec_id", "cluster")
    orig = members.select("vec_id", "cluster")
    assert sorted(map(tuple, re_assigned.collect())) == sorted(
        map(tuple, orig.collect())
    )


def test_untouched_cluster_never_joined(spark, planted):
    """The scale claim: a batch near axes 0 and 3 must never see the
    20-member axis-6 cluster in the pruned frame — per-ingest cost scales
    with touched clusters, not corpus size."""
    corpus, centroids, members = planted
    batch = spark.createDataFrame(
        [(200, _near(0, eps=0.04)), (201, _near(3, eps=0.04))],
        "vec_id long, embedding array<double>",
    )
    assigned, touched_members, pairs = incremental_semdedup(
        batch, centroids, members, tau=0.9
    )
    touched_ids = {r.vec_id for r in touched_members.collect()}
    assert touched_ids == {0, 1, 2, 10, 11, 12}, touched_ids
    assert not any(100 <= i < 120 for i in touched_ids)
    # every near-dup pair found, each exactly once, batch-side first
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    assert got == {(200, 0), (200, 1), (200, 2), (201, 10), (201, 11), (201, 12)}


def test_growing_far_cluster_does_not_grow_join(spark, planted):
    corpus, centroids, members = planted
    # corpus 10x bigger in the UNTOUCHED cluster only
    extra = spark.createDataFrame(
        [(1000 + i, _near(6, eps=0.001 * (i % 7))) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    grown = members.unionByName(
        assign_to_centroids(extra, centroids).select(
            "vec_id", "embedding", "cluster", "csim"
        )
    )
    batch = spark.createDataFrame(
        [(300, _near(0, eps=0.03))], "vec_id long, embedding array<double>"
    )
    _, touched_small, pairs_small = incremental_semdedup(
        batch, centroids, members, tau=0.9
    )
    _, touched_grown, pairs_grown = incremental_semdedup(
        batch, centroids, grown, tau=0.9
    )
    assert touched_small.count() == touched_grown.count() == 3
    assert sorted(map(tuple, pairs_small.collect())) == sorted(
        map(tuple, pairs_grown.collect())
    )


def test_loser_rule_and_displacement(spark, planted):
    """Keep-low-centroid-similarity: the member CLOSER to its centroid
    loses. A batch doc sitting closer than a stored doc displaces it
    (pair_kind='new_old', loser=old); a batch doc further out loses
    itself. Batch-batch ties go to the greater vec_id."""
    corpus, centroids, members = planted
    centroid0 = [
        r.centroid
        for r in centroids.collect()
        if assign_to_centroids(
            corpus.sparkSession.createDataFrame(
                [(0, _unit(0))], "vec_id long, embedding array<double>"
            ),
            centroids,
        ).first().cluster == r.cluster
    ][0]
    # batch doc 400 IS (almost) the centroid → highest csim → loses to all;
    # twins 500/501 tie → 501 (greater id) loses
    batch = spark.createDataFrame(
        [(400, [float(x) for x in centroid0]), (500, _near(3, eps=0.04)), (501, _near(3, eps=0.04))],
        "vec_id long, embedding array<double>",
    )
    _, _, pairs = incremental_semdedup(batch, centroids, members, tau=0.9)
    rows = pairs.collect()
    # every pair involving 400 names 400 the loser (it's nearest the centroid)
    p400 = [r for r in rows if r.vec_a == 400]
    assert p400 and all(r.loser_vec == 400 for r in p400)
    assert all(r.pair_kind == "new_old" for r in p400)
    tie = [r for r in rows if {r.vec_a, r.vec_b} == {500, 501}]
    assert len(tie) == 1 and tie[0].loser_vec == 501 and tie[0].pair_kind == "new_new"


def test_lane_shape(spark):
    """The registered lane runs on the real sf table and its arithmetic
    holds: survivors = batch − dropped ≤ batch, touched ≥ 0."""
    from big_data_analytics_machine_learning_poc_spark.operators.semdedup_incr import (
        dedup_semdedup_incremental,
    )

    out = dedup_semdedup_incremental(spark, "/root/testdata/sf0.001").collect()
    assert out, "lane returned no rows"
    for r in out:
        assert 0 <= r.n_batch_survivors <= r.n_batch
        assert r.n_corpus_touched >= 0 and r.n_old_displaced <= r.n_pairs_new_old
