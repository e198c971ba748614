"""Multi-iteration distributed k-means (Lloyd) with exact fixed-point
arithmetic — the iterative-convergence companion to the single
assignment step in ``plans/corpus_ops.emb_kmeans_step`` and the second
iterative algorithm alongside PageRank (``plans/graph_iterative``).

Determinism across engines AND across partitionings:
- seeds are the first K vectors by id (no RNG);
- member coordinates are floored into integer micro-units BEFORE the
  per-cluster mean, so the cross-row reduce is an exact bigint sum
  (order-independent) and the new centroid coordinate
  ``sum_micro / n / 1e6`` is one exact double expression;
- distances to centroids are sequential left-to-right folds
  (``F.aggregate`` == DuckDB ``list_sum``);
- assignment ties break on the lower cluster id.

Scale shape per iteration: one broadcast of the constant K x dim
centroid frame, one map-only assignment pass, one (cluster, dim)
partial-agg shuffle of K*dim rows per map task. The loop lives in the
driver but every iteration's data pass is fully distributed — same
pattern as PageRank, with the iteration bound fixed (not
convergence-tested) so the unrolled SQL oracle is exactly
equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

K = 10
DIM = 64
ITERS = 3

# d2 between the row's embedding and a centroid array column `cv`
# (both folded left-to-right as exact doubles)
_D2_SPARK = f"""
aggregate(
  transform(sequence(1, {DIM}), i ->
    power(cast(element_at(embedding, i) as double) - element_at(cv, i), 2D)),
  0D, (a, t) -> a + t)
"""


def _duck_d2(emb: str, cv: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {DIM}), i -> "
        f"pow(CAST({emb}[i] AS DOUBLE) - {cv}[i], 2)))"
    )


def _duck_oracle() -> str:
    """Unrolled {ITERS}-iteration oracle: each block assigns against
    the previous centroids and rebuilds exact-mean centroids."""
    # c0: seed centroids as double arrays
    parts = [
        f"""
    c0 AS (
      SELECT vec_id AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings WHERE vec_id < {K} AND embedding IS NOT NULL
    )"""
    ]
    for it in range(1, ITERS + 1):
        prev, cur = f"c{it - 1}", f"c{it}"
        parts.append(f"""
    a{it} AS (
      SELECT e.vec_id, s.cid, e.embedding
      FROM (SELECT vec_id, embedding FROM embeddings
            WHERE embedding IS NOT NULL) e CROSS JOIN {prev} s
      QUALIFY row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {_duck_d2("e.embedding", "s.cv")}, s.cid) = 1
    )""")
        if it < ITERS:
            parts.append(f"""
    m{it} AS (
      SELECT cid, i,
             CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                  AS BIGINT) AS s,
             COUNT(*) AS n
      FROM (
        SELECT cid, unnest(embedding) AS x,
               unnest(generate_series(1, {DIM})) AS i
        FROM a{it}
      ) GROUP BY cid, i
    ),
    {cur} AS (
      SELECT cid, list(CAST(s AS DOUBLE) / n / 1000000.0 ORDER BY i) AS cv
      FROM m{it} GROUP BY cid
    )""")
    body = ",".join(parts)
    last = f"a{ITERS}"
    return f"""
    WITH {body}
    SELECT a.cid AS cluster_id,
           COUNT(*) AS n_members,
           CAST(SUM(CAST(floor({_duck_d2("a.embedding", "s.cv")} * 1000000)
                         AS BIGINT)) AS BIGINT) AS inertia_micro
    FROM {last} a JOIN c{ITERS - 1} s ON a.cid = s.cid
    GROUP BY a.cid
    """


def _assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the K-row centroid
    frame, fold distances, argmin via per-vector window."""
    pairs = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "embedding", "cid", F.expr(_D2_SPARK).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "embedding", "d2")
    )


def _recenter(assigned: DataFrame) -> DataFrame:
    """Exact-mean centroid rebuild: micro-unit bigint sums per
    (cluster, dim), then one sorted-collect back into arrays."""
    dims = assigned.select(
        "cid",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> cast(floor(cast(x as double) * 1000000) as bigint))"
            )
        ).alias("i", "xm"),
    )
    sums = dims.groupBy("cid", "i").agg(
        F.sum("xm").cast("long").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return sums.groupBy("cid").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "i",
                        (
                            F.col("s").cast("double")
                            / F.col("n")
                            / F.lit(1000000.0)
                        ).alias("v"),
                    )
                )
            ),
            lambda st: st.v,
        ).alias("cv")
    )


@register("emb_kmeans_iterations", oracle=_duck_oracle())
def emb_kmeans_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{ITERS} Lloyd iterations from deterministic seeds; returns the
    final per-cluster membership and exact micro-unit inertia."""
    # NULL vectors out on both sides (argmin NULL-ordering divergence)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    cents = emb.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("cv"),
    )
    assigned = None
    for it in range(1, ITERS + 1):
        assigned = _assign(emb, cents)
        if it < ITERS:
            # truncate lineage at the K-row centroid frame each
            # iteration (the PageRank idiom): without this the final
            # plan nests every previous iteration's crossJoin+window
            # and re-executes it per reuse. coalesce(1): K rows
            # checkpoint as one block, not shuffle-width tasks.
            cents = _recenter(assigned).coalesce(1).localCheckpoint(eager=True)
    return (
        assigned.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.floor(F.col("d2") * 1000000).cast("long"))
            .cast("long")
            .alias("inertia_micro"),
        )
    )
