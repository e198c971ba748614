"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the embedding space, then find
near-duplicate pairs ONLY within each cluster and keep one canonical
representative per duplicate group. This is the scale trick that makes
embedding-level dedup tractable on web-scale corpora: the O(N²)
all-pairs cosine becomes K × O((N/K)²), and K is chosen so each
cluster's pair block fits one task (the paper uses K≈11k on 233M
docs; the mechanism here is identical with the fixture's K=10).

Spark shape (one plan, no iteration):

1. assignment — nearest of K deterministic seed centroids per vector
   (the same constant-size broadcast + per-vector argmin window as
   ``emb_kmeans_step``; at 100 TB the centroid frame is K×dim floats,
   broadcast-safe by construction);
2. within-cluster pairs — self-equi-join on ``cluster_id`` (shuffle
   keyed on cluster_id; balanced by the K choice, never all-pairs),
   cosine via the left-assoc zip_with/aggregate HOF fold that is
   bit-identical to DuckDB's ``list_sum`` (see
   ``dedup_fuzzy.dedup_embedding_neardup`` for the codegen history);
3. keep-rule — deterministic keep-lowest-vec_id: a vector is removed
   iff a smaller-id vector in its cluster is within the similarity
   threshold (the paper keeps a random/centroid-nearest member per
   group; a pinned total order makes the same reduction
   oracle-checkable);
4. per-cluster reconciliation — members / duplicate pairs / removed /
   kept, sizes left-joined with pair stats so empty clusters keep
   zeros.

TAU = 0.3 is fixture-calibrated (synthetic embeddings are near-
orthogonal: 260 of 12.4k within-cluster pairs at sf0.01, so removal
is non-trivial but not degenerate); a production corpus uses the
paper's 0.9+ on real semantic neighbors.

100 TB note on the persist: the assignment frame is corpus-sized and
is needed by three consumers (two join sides + sizes), so ONE
materialization is inherent to the algorithm, not an optimization
choice — without it the argmin recomputes per consumer (measured 3x
on the cold plan). ``scoped_persist`` uses MEMORY_AND_DISK (spills,
never OOMs); at full scale the same role is played by writing the
assignment to a staging table, which also makes the per-cluster pair
stage restartable.

Reference lifecycle note: the reference dedups on exact key equality
only (``etl_process.py:213``); this is the semantic-space
generalization the LLM-pipeline mandate adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .corpus_ops import _D2_DUCK, _D2_SPARK, KMEANS_K

TAU = 0.3

_COS_DUCK = """
list_sum(list_transform(list_zip(a.embedding, b.embedding),
         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
/ (sqrt(list_sum(list_transform(a.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
 * sqrt(list_sum(list_transform(b.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH vecs AS (
      SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
    ),
    seeds AS (
      SELECT vec_id AS seed_id, embedding AS sv FROM vecs
      WHERE vec_id < {KMEANS_K}
    ),
    assign AS (
      SELECT e.vec_id, e.embedding, s.seed_id,
             row_number() OVER (
               PARTITION BY e.vec_id ORDER BY {_D2_DUCK}, s.seed_id) AS rn
      FROM vecs e CROSS JOIN seeds s
    ),
    best AS (
      SELECT vec_id, embedding, seed_id AS cluster_id
      FROM assign WHERE rn = 1
    ),
    pairs AS (
      SELECT a.cluster_id, b.vec_id AS v2
      FROM best a JOIN best b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE {_COS_DUCK} >= {TAU}
    ),
    rem AS (
      SELECT cluster_id,
             CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
             CAST(COUNT(DISTINCT v2) AS BIGINT) AS n_removed
      FROM pairs GROUP BY cluster_id
    ),
    sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
      FROM best GROUP BY cluster_id
    )
    SELECT s.cluster_id, s.n_members,
           CAST(COALESCE(r.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
           CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
           CAST(s.n_members - COALESCE(r.n_removed, 0) AS BIGINT) AS n_kept
    FROM sizes s LEFT JOIN rem r ON s.cluster_id = r.cluster_id
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import norm_flat

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    seeds = emb.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("sv")
    )
    pairs = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "embedding", "seed_id", F.expr(_D2_SPARK).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "seed_id")
    # materialize the assignment ONCE: the self-join's attribute
    # dedup makes the a/b subtrees non-identical, so without a
    # persist the argmin window recomputes three times (both join
    # sides + the sizes aggregate — measured on the cold plan);
    # released by the harness via caching.release_persisted()
    from ..caching import scoped_persist

    best = scoped_persist(
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "embedding",
            norm_flat("embedding").alias("nrm"),
            F.col("seed_id").alias("cluster_id"),
        )
        .repartition("cluster_id")
    )
    a = best.select(
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
        "cluster_id",
    )
    b = best.select(
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
        "cluster_id",
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    dup_pairs = (
        a.join(b, "cluster_id")
        .filter(F.col("v1") < F.col("v2"))
        .filter((dot / (F.col("na") * F.col("nb"))) >= TAU)
        .select("cluster_id", "v2")
    )
    rem = dup_pairs.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.countDistinct("v2").alias("n_removed"),
    )
    sizes = best.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        sizes.join(rem, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("long").alias("n_dup_pairs"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            (
                F.col("n_members") - F.coalesce("n_removed", F.lit(0))
            ).cast("long").alias("n_kept"),
        )
    )
