"""Incremental-store variants for the SimHash and n-gram Jaccard
dedup families — completing the production posture
``dedup_incremental_newbatch`` established for MinHash (VERDICT r15
task 4): EVERY fuzzy-dedup family now has a batch path whose history
side is a bucketed signature store read with NO Exchange — the
100-TB history shuffle is paid once at write time, each new ingest
batch shuffles only itself into the store's bucketing.

Two stores, same lifecycle as the MinHash band store (shared
``_store_root``: per-session dir, atexit cleanup, stale-sibling
sweep):

- SimHash: history rows ``(doc_id, simhash, band)`` where ``band``
  fuses the band id into one 16-byte key —
  ``unhex(md5(i || ':' || substr(simhash, 8i+1, 8)))`` for the 4
  8-bit bands of the 32-bit signature (the classic Charikar banding:
  Hamming distance <= 4 implies at least one of 4 bands is intact
  only probabilistically, but a band COLLISION is the standard cheap
  candidate filter).  Candidates are then verified with the exact
  Hamming distance (<= {HAM_T}) — the two-stage shape every simhash
  deployment runs, here with the verify stage on candidate pairs
  only.
- n-gram Jaccard: history rows ``(doc_id, n, key)`` — one row per
  DISTINCT 3-token shingle, ``key = unhex(md5(shingle))`` (16-byte
  binary join keys: md5/unhex fold identically on both engines, so
  hashing long shingle text loses no oracle exactness), ``n`` the
  doc's distinct-shingle count denormalized for the Jaccard
  denominator.  A new doc's verdict needs history sizes WITHOUT
  touching history docs outside shared-shingle buckets — exactly
  what the denormalized ``n`` provides.

Both emit per new-batch document the candidate count, the verified
near-dup count, and the keep verdict; the DuckDB oracle recomputes
both sides from scratch, so any bucket-routing or verify-stage bug
flips the hash.  Fixture split: history = ``doc_id % 10 != 0``,
new batch = ``doc_id % 10 = 0`` (the ``dedup_incremental``
convention).

``tests/test_dedup_incremental_more.py`` asserts the executed plans
carry zero Exchange above each history store scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import shingles_long, sql_simhash_expr
from ..registry import register
from ..sources import load_table
from .dedup_fuzzy import _DUCK_SHINGLES, _simhash_df
from .dedup_incremental import N_BUCKETS, _store_root

HAM_T = 4          # max Hamming distance for a simhash near-dup
JACCARD_T = 0.05   # the dedup_ngram_jaccard threshold
SIM_BANDS = 4      # 4 bands x 8 bits over the 32-bit signature


def _provision(
    spark: SparkSession, sf_dir: str, kind: str, frame: DataFrame,
    bucket_col: str,
) -> str:
    """History frame as a bucketed+sorted external table (idempotent
    per SF; catalog entry re-registered per session)."""
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    name = f"{kind}_store_{sf.replace('.', '_').replace('-', '_')}"
    path = os.path.join(_store_root(spark), name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        frame.write.mode("overwrite")
        .bucketBy(N_BUCKETS, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )
    return name


# --- SimHash ---------------------------------------------------------

def _sim_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, simhash, band): the 4 fused 16-byte band keys."""
    bands = F.array(
        *[
            F.unhex(
                F.md5(
                    F.concat(
                        F.lit(f"{i}:"),
                        F.substring("simhash", 8 * i + 1, 8),
                    )
                )
            )
            for i in range(SIM_BANDS)
        ]
    )
    return sig.select("doc_id", "simhash", F.explode(bands).alias("band"))


_SIM_HAMMING_DUCK = (
    "len(list_filter(generate_series(1, 32),"
    " i -> substr(nsig, i, 1) <> substr(hsig, i, 1)))"
)

_SIM_ORACLE = f"""
WITH hist AS (
  SELECT doc_id, {sql_simhash_expr("text")} AS sig FROM documents
  WHERE doc_id % 10 <> 0
),
newd AS (
  SELECT doc_id, {sql_simhash_expr("text")} AS sig FROM documents
  WHERE doc_id % 10 = 0
),
g AS (SELECT unnest(generate_series(0, {SIM_BANDS - 1})) AS i),
hb AS (
  SELECT doc_id, sig,
         unhex(md5(CAST(i AS VARCHAR) || ':' || substr(sig, i * 8 + 1, 8)))
           AS band
  FROM hist, g
),
nb AS (
  SELECT doc_id, sig,
         unhex(md5(CAST(i AS VARCHAR) || ':' || substr(sig, i * 8 + 1, 8)))
           AS band
  FROM newd, g
),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS hist_id,
         n.sig AS nsig, h.sig AS hsig
  FROM nb n JOIN hb h ON h.band = n.band
),
per AS (
  SELECT new_id,
         CAST(COUNT(*) AS BIGINT) AS n_hist_candidates,
         CAST(SUM(CASE WHEN {_SIM_HAMMING_DUCK} <= {HAM_T}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_hist_neardups
  FROM cand GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(per.n_hist_candidates, 0) AS n_hist_candidates,
       COALESCE(per.n_hist_neardups, 0) AS n_hist_neardups,
       COALESCE(per.n_hist_neardups, 0) = 0 AS keep
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
LEFT JOIN per ON per.new_id = d.doc_id
"""

_SIM_HAMMING_SPARK = (
    "size(filter(sequence(1, 32),"
    " i -> substring(nsig, i, 1) <> substring(hsig, i, 1)))"
)


def _provision_simhash_store(spark: SparkSession, sf_dir: str) -> str:
    hist = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    return _provision(
        spark, sf_dir, "simhash_band", _sim_bands(_simhash_df(hist)), "band"
    )


@register("dedup_incremental_simhash", oracle=_SIM_ORACLE)
def dedup_incremental_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _provision_simhash_store(spark, sf_dir)
    hist = spark.table(store).select(
        F.col("doc_id").alias("hist_id"), F.col("simhash").alias("hsig"),
        "band",
    )
    newd = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    new_bands = _sim_bands(_simhash_df(newd)).select(
        F.col("doc_id").alias("new_id"), F.col("simhash").alias("nsig"),
        "band",
    )
    cand = (
        new_bands.join(hist, "band")
        .select("new_id", "hist_id", "nsig", "hsig")
        .distinct()
    )
    per = cand.groupBy("new_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hist_candidates"),
        F.sum(
            F.when(F.expr(_SIM_HAMMING_SPARK) <= HAM_T, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_hist_neardups"),
    )
    nd = F.coalesce(F.col("n_hist_neardups"), F.lit(0))
    return (
        newd.select("doc_id")
        .join(per, per["new_id"] == F.col("doc_id"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hist_candidates"), F.lit(0)).alias(
                "n_hist_candidates"
            ),
            nd.alias("n_hist_neardups"),
            (nd == 0).alias("keep"),
        )
    )


# --- n-gram Jaccard --------------------------------------------------

def _shingle_keys(d: DataFrame) -> DataFrame:
    """(doc_id, n, key): distinct 3-shingles as 16-byte md5 keys with
    the doc's distinct-shingle count denormalized per row."""
    sh = shingles_long(d, "text", 3).distinct()
    sized = sh.join(
        sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n")),
        "doc_id",
    )
    return sized.select("doc_id", "n", F.unhex(F.md5("s")).alias("key"))


_NGRAM_ORACLE = f"""
WITH hs AS (
  SELECT doc_id, unnest(list_distinct({_DUCK_SHINGLES})) AS s
  FROM documents WHERE doc_id % 10 <> 0
),
hist AS (
  SELECT doc_id, unhex(md5(s)) AS key,
         CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
  FROM hs
),
ns AS (
  SELECT doc_id, unnest(list_distinct({_DUCK_SHINGLES})) AS s
  FROM documents WHERE doc_id % 10 = 0
),
newb AS (
  SELECT doc_id, unhex(md5(s)) AS key,
         CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n
  FROM ns
),
pairs AS (
  SELECT n.doc_id AS new_id, h.doc_id AS hist_id,
         CAST(COUNT(*) AS BIGINT) AS inter,
         MAX(n.n) AS n_new, MAX(h.n) AS n_hist
  FROM newb n JOIN hist h ON h.key = n.key
  GROUP BY 1, 2
),
per AS (
  SELECT new_id,
         CAST(COUNT(*) AS BIGINT) AS n_hist_candidates,
         CAST(SUM(CASE WHEN CAST(inter AS DOUBLE)
                            / (n_new + n_hist - inter) >= {JACCARD_T}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_hist_neardups
  FROM pairs GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(per.n_hist_candidates, 0) AS n_hist_candidates,
       COALESCE(per.n_hist_neardups, 0) AS n_hist_neardups,
       COALESCE(per.n_hist_neardups, 0) = 0 AS keep
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
LEFT JOIN per ON per.new_id = d.doc_id
"""


def _provision_ngram_store(spark: SparkSession, sf_dir: str) -> str:
    hist = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    return _provision(
        spark, sf_dir, "ngram_shingle", _shingle_keys(hist), "key"
    )


@register("dedup_incremental_ngram", oracle=_NGRAM_ORACLE)
def dedup_incremental_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _provision_ngram_store(spark, sf_dir)
    hist = spark.table(store).select(
        F.col("doc_id").alias("hist_id"), F.col("n").alias("n_hist"), "key"
    )
    newd = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    new_keys = _shingle_keys(newd).select(
        F.col("doc_id").alias("new_id"), F.col("n").alias("n_new"), "key"
    )
    pairs = (
        new_keys.join(hist, "key")
        .groupBy("new_id", "hist_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("inter"),
            F.max("n_new").alias("n_new"),
            F.max("n_hist").alias("n_hist"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("n_new") + F.col("n_hist") - F.col("inter")
    )
    per = pairs.groupBy("new_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hist_candidates"),
        F.sum(F.when(jac >= JACCARD_T, 1).otherwise(0))
        .cast("long")
        .alias("n_hist_neardups"),
    )
    nd = F.coalesce(F.col("n_hist_neardups"), F.lit(0))
    return (
        newd.select("doc_id")
        .join(per, per["new_id"] == F.col("doc_id"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hist_candidates"), F.lit(0)).alias(
                "n_hist_candidates"
            ),
            nd.alias("n_hist_neardups"),
            (nd == 0).alias("keep"),
        )
    )
