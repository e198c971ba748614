"""Iterative algorithm template: PageRank over the customer-supplier
bipartite trade graph (edges = distinct (custkey, suppkey) pairs that
traded, both directions).

Shows the engine's iterative-loop discipline:
- each iteration is a join + aggregate (one shuffle);
- ``localCheckpoint`` truncates lineage every iteration — without it
  the plan doubles per iteration and the 10th iteration replans 2^10
  joins;
- dangling mass and the damping term keep the distribution a proper
  probability vector.

No SQL oracle (iterative; driver records the rows-only check) — the
invariants (mass conservation, determinism under repartitioning) are
pinned by tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

DAMPING = 0.85
N_ITER = 8


def pagerank(edges: DataFrame, n_iter: int = N_ITER, damping: float = DAMPING) -> DataFrame:
    """edges(src, dst) -> (vertex, rank). Undirected treatment: caller
    supplies both directions."""
    vertices = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst")))
        .distinct()
        .coalesce(8)
        .cache()
    )
    n = vertices.count()
    # size the cached edge partitioning to the data, not to the shuffle
    # width of whatever produced it (a union of two 200-partition
    # shuffles yields 400 near-empty partitions whose per-iteration
    # task-scheduling overhead dwarfs the compute)
    edges = edges.repartition(8).cache()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).coalesce(8).cache()
    ranks = vertices.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        # the rank/degree vectors are |V| rows — broadcast them into
        # the edge scan so each iteration shuffles only the per-dst
        # partial sums, never the edge list
        contribs = (
            edges.join(F.broadcast(ranks), edges.src == ranks.vertex)
            .join(F.broadcast(out_deg), "src")
            .select(F.col("dst").alias("vertex"), (F.col("rank") / F.col("deg")).alias("c"))
            # pre-partition at the width the tiny rank vector needs; the
            # groupBy reuses it instead of the session-wide shuffle width
            .repartition(8, "vertex")
            .groupBy("vertex")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            vertices.join(contribs, "vertex", "left")
            .select(
                "vertex",
                ((1 - damping) / n + damping * F.coalesce("contrib", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            # coalesce: the rank vector is |V| rows; checkpointing it at
            # the session's full shuffle width (e.g. 200 partitions)
            # costs far more than the compute
            .coalesce(8)
            # truncate lineage: keeps iteration k's plan O(1), not O(2^k)
            .localCheckpoint(eager=True)
        )
    return ranks


@register("graph_pagerank_trade", oracle=None)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # customer -c- supplier edges via orders->lineitem; suppliers get
    # negative ids to keep the two vertex domains disjoint
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), (-F.col("l_suppkey") - 1).alias("s"))
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges)
    return ranks.orderBy(F.desc("rank"), "vertex").limit(20)
