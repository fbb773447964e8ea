"""Iterative graph analytics over the relational tables.

Companion to the dedup family's connected components (min-label
propagation, `operators/dedup.py`): PageRank adds weighted iterative
propagation — the canonical join-agg-per-iteration workload (SURVEY §2
has no reference counterpart; BASELINE.json extension surface).

Graph: the customer -> supplier procurement network, edges = distinct
(c_custkey, l_suppkey) pairs reachable through orders + lineitem. Node
ids are namespaced strings ("c:123" / "s:45") so the two key spaces
can't collide.

Scale shape per iteration: one equi-join of the rank vector against the
edge list (both partitioned by the join key) + one groupBy(dst) partial
agg — the standard Pregel-as-dataframes rendering. The rank vector is
localCheckpoint'ed every iteration — it feeds two consumers per step
(dangling aggregate + contribs join), so materializing the n_nodes-row
vector beats re-running chained join+agg lineage inside the dangling
job (measured ~25% lane-level vs checkpoint-every-3); dangling-node mass (suppliers have no
out-edges) is redistributed uniformly each iteration via a 1-row
aggregate, so total rank mass stays 1 and the result matches the
textbook definition. Float sums across partitions make the last bits
partitioning-dependent — the lane rounds to 6 dp and registers
rows-only; the golden test checks a planted graph against an
independent pure-Python reference within 1e-9."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QueryRegistry

REG = QueryRegistry()

DAMPING = 0.85


def pagerank(
    edges: DataFrame, iterations: int = 10, damping: float = DAMPING
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``. Returns
    (node, rank) for every node appearing as src or dst; dangling mass is
    redistributed uniformly (total mass == 1 every iteration)."""
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint()
    n_nodes = nodes.count()
    # edges/outdeg are referenced by THREE jobs per iteration (dangling
    # collect, contribs join, next iteration's join) — checkpoint both so
    # the edge-derivation lineage (a join+distinct in the procurement
    # lane) runs once, not ~30 times over 10 iterations
    edges = edges.localCheckpoint()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for i in range(iterations):
        # materialize the rank vector ONCE per iteration: the dangling
        # aggregate and the contribs join both consume it, and the
        # every-3-iterations variant measurably lost more to re-running
        # up to three chained join+agg stages inside the dangling job
        # than the n_nodes-row checkpoint costs (measured ~25% lane-level)
        ranks = ranks.localCheckpoint()
        with_deg = ranks.join(outdeg, ranks.node == outdeg.src, "left").select(
            "node", "rank", "outdeg"
        )
        # dangling mass: nodes with no out-edges leak their rank; collect
        # the 1-row total and hand it back uniformly (a driver scalar,
        # same shape as a scalar subquery)
        dangling = (
            with_deg.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        )
        contribs = (
            with_deg.filter(F.col("outdeg").isNotNull())
            .join(edges, with_deg.node == edges.src)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
    return ranks


@REG.add("graph_pagerank_procurement")  # rows-only: iterative float
# propagation is partitioning-sensitive in its last bits; golden-tested
# against an independent pure-Python reference (tests/test_ml.py)
def graph_pagerank_procurement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes of the customer->supplier procurement network by
    PageRank (10 iterations, d=0.85)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return (
        pagerank(edges, iterations=10)
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )
