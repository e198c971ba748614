"""MinHash estimator calibration — estimate-vs-exact error accounting
for the signature screen (Broder 1997: the fraction of agreeing
minhash components is an unbiased estimator of Jaccard similarity
with variance J(1-J)/k).  ``ann_recall_eval`` audits the ANN index
against brute force; this is the same discipline for the dedup
family: for every LSH candidate pair, the 8-component signature
estimate sits next to the EXACT 3-shingle Jaccard, with the error in
exact integer micro-units and the screen decision (estimate >= 0.5
vs truth >= 0.5) classified into tp/fp/fn/tn — the confusion table a
production dedup run monitors before trusting signature-level
thresholds at 100 TB (where computing exact Jaccard per pair is
unaffordable and the estimator IS the decision).

Exactness: ``est = n_eq/8`` and ``exact = inter/union`` are single
exact divisions; the error ``|n_eq*union - 8*inter| * 1e6 DIV
(8*union)`` is pure bigint arithmetic (non-negative operands, so
DuckDB ``//`` truncation == floor == Spark ``DIV``), and both screen
thresholds are INTEGER comparisons (``n_eq >= 4``,
``2*inter >= union``) — no float enters any verdict.

Plan shape: candidate pairs come from the SHARED capped banded LSH
geometry (``dedup_fuzzy.lsh_candidate_pairs`` — never all-pairs, and
hot band buckets occupancy-capped at BAND_CAP so candidates are
bounded at cap(cap-1)/2 per bucket); the signature frame is persisted
once and feeds the band join and both sides of the agreement join;
the exact side joins the cached distinct-shingle frame per pair — the
expensive exact computation is confined to the (bounded) candidate
set, which is exactly the point of the calibration.

Reference lifecycle note: the reference (etl_process.py:1-235) has no
similarity surface; minhash accuracy auditing is north-star dedup
machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import scoped_persist
from ..operators.text import shingles_long
from ..registry import register
from ..sources import load_table
from .dedup_fuzzy import _DUCK_SHINGLES, _minhash_sig_df, lsh_candidate_pairs
from .graph_components import _PAIRS_SQL

_N_EQ_SQL = " + ".join(
    f"(CASE WHEN s1.mh{i} = s2.mh{i} THEN 1 ELSE 0 END)" for i in range(8)
)

_SCREEN = (
    "CASE WHEN n_eq >= 4 AND 2 * inter >= uni THEN 'tp' "
    "WHEN n_eq >= 4 THEN 'fp' "
    "WHEN 2 * inter >= uni THEN 'fn' ELSE 'tn' END"
)


@register(
    "dedup_minhash_calibration",
    oracle=f"""
    WITH {_PAIRS_SQL},
    sh AS (
      SELECT doc_id, unnest(list_distinct({_DUCK_SHINGLES})) AS s
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter_c AS (
      SELECT p.d1, p.d2, CAST(COUNT(*) AS BIGINT) AS inter
      FROM pairs p
      JOIN sh a ON a.doc_id = p.d1
      JOIN sh b ON b.doc_id = p.d2 AND b.s = a.s
      GROUP BY p.d1, p.d2
    ),
    eq AS (
      SELECT p.d1, p.d2, CAST({_N_EQ_SQL} AS BIGINT) AS n_eq
      FROM pairs p
      JOIN sig s1 ON s1.doc_id = p.d1
      JOIN sig s2 ON s2.doc_id = p.d2
    ),
    m AS (
      SELECT e.d1, e.d2, e.n_eq,
             COALESCE(i.inter, 0) AS inter,
             sa.n + sb.n - COALESCE(i.inter, 0) AS uni
      FROM eq e
      LEFT JOIN inter_c i ON i.d1 = e.d1 AND i.d2 = e.d2
      JOIN sizes sa ON sa.doc_id = e.d1
      JOIN sizes sb ON sb.doc_id = e.d2
    )
    SELECT d1, d2, n_eq,
           CAST(n_eq AS DOUBLE) / 8 AS est_jaccard,
           inter, CAST(uni AS BIGINT) AS uni,
           CAST(inter AS DOUBLE) / uni AS exact_jaccard,
           CAST(abs(n_eq * uni - 8 * inter) * 1000000 // (8 * uni)
                AS BIGINT) AS err_micro,
           {_SCREEN} AS screen
    FROM m
    """,
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # persisted: the signature subplan feeds the banded self-join
    # (twice) AND both sides of the component-agreement join below —
    # without the barrier the shingle-explode + 8-md5 pipeline ran 4x
    # (this was the bench's slowest query before r17)
    sig = scoped_persist(_minhash_sig_df(d).filter(F.col("mh0").isNotNull()))
    # shared capped band geometry (dedup_fuzzy.lsh_candidate_pairs) —
    # the calibration audits EXACTLY the candidate set the production
    # pair generator emits, occupancy cap included
    pairs = lsh_candidate_pairs(sig).select("d1", "d2").distinct()

    sh = scoped_persist(shingles_long(d, "text", 3).distinct())
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter_c = (
        pairs.join(sh.select(F.col("doc_id").alias("d1"), "s"), "d1")
        .join(sh.select(F.col("doc_id").alias("d2"), "s"), ["d2", "s"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    s1 = sig.select(
        F.col("doc_id").alias("d1"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(8)]
    )
    s2 = sig.select(
        F.col("doc_id").alias("d2"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(8)]
    )
    n_eq = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(8)
    )
    eq = (
        pairs.join(s1, "d1").join(s2, "d2")
        .select("d1", "d2", n_eq.cast("long").alias("n_eq"))
    )
    m = (
        eq.join(inter_c, ["d1", "d2"], "left")
        .join(sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("na")), "d1")
        .join(sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("nb")), "d2")
        .select(
            "d1",
            "d2",
            "n_eq",
            F.coalesce("inter", F.lit(0)).alias("inter"),
            (F.col("na") + F.col("nb") - F.coalesce("inter", F.lit(0))).alias(
                "uni"
            ),
        )
    )
    return m.select(
        "d1",
        "d2",
        "n_eq",
        (F.col("n_eq").cast("double") / 8).alias("est_jaccard"),
        "inter",
        F.col("uni").cast("long").alias("uni"),
        (F.col("inter").cast("double") / F.col("uni")).alias("exact_jaccard"),
        F.expr(
            "CAST(abs(n_eq * uni - 8 * inter) * 1000000 DIV (8 * uni)"
            " AS BIGINT)"
        ).alias("err_micro"),
        F.expr(_SCREEN).alias("screen"),
    )
