"""Similarity search over the embeddings table.

- ``ann_cosine_topk``: exact brute-force cosine top-k (the baseline
  and the recall oracle). At 100 TB this is the per-bucket inner loop,
  not the global strategy.
- ``ann_lsh_topk``: random-hyperplane LSH bucketing — the scale path.
  Probes only the query's bucket (plus the exact re-rank within it);
  the hyperplanes are md5-derived so the bucketing is deterministic
  and reproducible across engines/runs. Rows-only check + a recall
  pytest against the brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


@register(
    "ann_cosine_topk",
    oracle=f"""
    SELECT qid, vec_id, cosine, rn FROM (
      SELECT q.vec_id AS qid, v.vec_id AS vec_id,
             list_sum(list_transform(list_zip(q.embedding, v.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
               AS cosine,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_sum(list_transform(list_zip(q.embedding, v.embedding),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))
               DESC, v.vec_id) AS rn
      FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    v = emb.select("vec_id", F.col("embedding").alias("vv"))
    cosine = _dot("qv", "vv") / (_norm("qv") * _norm("vv"))
    scored = (
        q.join(F.broadcast(v), F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", cosine.alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cosine", "rn")
    )


# Scale path: random-hyperplane LSH. Each vector's bucket is the sign
# pattern of its projections onto n_planes deterministic pseudo-random
# hyperplanes (md5-derived coefficients in [-0.5, 0.5)). Probing only
# the query's bucket turns all-pairs O(N·Q) into O(N·Q / 2^planes)
# expected — re-ranked exactly within the bucket.
N_PLANES = 4


def _plane_term(p: int):
    def term(x, i):
        coeff = (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"plane{p}_"), i)), 1, 8), 16, 10)
            .cast("double")
            / F.lit(float(16**8))
            - 0.5
        )
        return x.cast("double") * coeff

    return term


def _lsh_bucket(vec_col):
    bits = []
    for p in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(vec_col, F.sequence(F.lit(0), F.size(vec_col) - 1), _plane_term(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


@register("ann_lsh_topk", oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", _lsh_bucket(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), "bucket"
    )
    v = emb.select("vec_id", F.col("embedding").alias("vv"), "bucket")
    cosine = _dot("qv", "vv") / (_norm("qv") * _norm("vv"))
    scored = (
        q.join(v, "bucket")
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", cosine.alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cosine", "rn")
    )


# MLlib-integrated alternative: BucketedRandomProjectionLSH (euclidean)
# with approxSimilarityJoin — the library path when the pipeline
# already uses Spark ML. Seeded, so results are reproducible run to
# run, but the hash family is JVM-internal (not portable to the SQL
# oracle) — rows-only check + the distance/recall pytest.
@register("ann_ml_brp_lsh", oracle=None)
def ann_ml_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=0.5, numHashTables=4, seed=42
    )
    model = lsh.fit(emb)
    pairs = model.approxSimilarityJoin(
        queries.withColumnRenamed("qv", "v"), emb, 1.2, distCol="dist"
    )
    return (
        pairs.filter(F.col("datasetA.qid") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.qid").alias("qid"),
            F.col("datasetB.vec_id").alias("vec_id"),
            F.col("dist"),
        )
    )


# IVF (inverted-file) ANN — the third scale path alongside the two LSH
# variants, and the only one that is fully oracle-checkable: the coarse
# codebook is a deterministic hash-picked sample (not trained k-means),
# cell assignment is argmax-cosine with a (cosine DESC, cid) tiebreak,
# and per-row double arithmetic is engine-identical. Probing the
# N_PROBE nearest cells turns the O(N·Q) scan into O(N·Q·nprobe/cells)
# expected, re-ranked exactly within the probed cells — the same
# partition-prune-then-rerank shape a 100 TB vector store needs (cells
# become partition keys; the assign pass is one map-side broadcast
# join; the search shuffles only candidates).
N_CELLS = 16
N_PROBE = 4


def _duck_cos(a: str, b: str) -> str:
    dot = (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )
    na = f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"
    return f"({dot} / ({na} * {nb}))"


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {N_CELLS}
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT v.vec_id, v.embedding, c.cid,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 {_duck_cos("v.embedding", "c.cv")} DESC, c.cid) AS arn
        FROM embeddings v CROSS JOIN cents c
      ) WHERE arn = 1
    ),
    probes AS (
      SELECT qid, cid FROM (
        SELECT q.vec_id AS qid, c.cid,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 {_duck_cos("q.embedding", "c.cv")} DESC, c.cid) AS prn
        FROM embeddings q CROSS JOIN cents c
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE prn <= {N_PROBE}
    )
    SELECT qid, vec_id, cosine, rn FROM (
      SELECT p.qid, a.vec_id,
             {_duck_cos("q.embedding", "a.embedding")} AS cosine,
             row_number() OVER (PARTITION BY p.qid ORDER BY
               {_duck_cos("q.embedding", "a.embedding")} DESC, a.vec_id) AS rn
      FROM probes p
      JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.qid
      JOIN embeddings q ON q.vec_id = p.qid
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(N_CELLS)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    cos_vc = _dot("embedding", "cv") / (_norm("embedding") * _norm("cv"))
    aw = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), "cid")
    assign = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("ccos", cos_vc)
        .withColumn("arn", F.row_number().over(aw))
        .filter(F.col("arn") == 1)
        .select("vec_id", "embedding", "cid")
    )
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        .crossJoin(F.broadcast(cents))
        .withColumn("ccos", _dot("qv", "cv") / (_norm("qv") * _norm("cv")))
        .withColumn("prn", F.row_number().over(
            Window.partitionBy("qid").orderBy(F.desc("ccos"), "cid")))
        .filter(F.col("prn") <= N_PROBE)
        .select("qid", "qv", "cid")
    )
    cosine = _dot("qv", "embedding") / (_norm("qv") * _norm("embedding"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        probes.join(assign, "cid")
        .filter(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", cosine.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "vec_id", "cosine", "rn")
    )


# Portable sign-plane family for cross-engine LSH: coefficient s(p,d)
# is +-1 decided by one md5 hex digit, and projections are sequential
# double folds — both bit-identical in Spark and DuckDB, so an LSH
# *dedup* built on these planes is exactly oracle-checkable (unlike
# the conv()-based family above, which has no DuckDB twin).
HP_BITS = 16
HP_BAND_BITS = 4  # 4 bands x 4 bits


def _sign_plane_bit(vec_col, p: int):
    def term(x, i):
        sign = F.when(
            F.substring(
                F.md5(F.concat(F.lit(f"hp{p}_"), i.cast("string"))), 1, 1
            )
            < "8",
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
        return x.cast("double") * sign

    proj = F.aggregate(
        F.zip_with(vec_col, F.sequence(F.lit(0), F.size(vec_col) - 1), term),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))


def sign_plane_signature(vec_col) -> F.Column:
    """HP_BITS-char '0'/'1' signature string of a vector column."""
    return F.concat(*[_sign_plane_bit(vec_col, p) for p in range(HP_BITS)])


def sql_sign_plane_signature(vec: str) -> str:
    """DuckDB twin of :func:`sign_plane_signature` (same md5 planes,
    same left-to-right fold)."""
    bits = []
    for p in range(HP_BITS):
        proj = (
            f"list_sum(list_transform(generate_series(1, len({vec})), i ->"
            f" (CASE WHEN substring(md5('hp{p}_' || CAST(i - 1 AS VARCHAR)), 1, 1)"
            f" < '8' THEN 1.0 ELSE -1.0 END) * CAST({vec}[i] AS DOUBLE)))"
        )
        bits.append(f"(CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)
