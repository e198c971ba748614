"""Blocked fuzzy record linkage (entity resolution) ACROSS tables —
the match-dirty-records-to-a-master-table operator, distinct from the
self-dedup family in ``dedup_fuzzy``: here a corrupted feed is linked
back to a clean dimension, the production shape of customer-file
onboarding and identity resolution.

Fixture: a "dirty feed" is derived deterministically from the
customer table by transposing one adjacent digit pair in the key part
of the name (position ``6 + custkey % 3`` of the 9-digit suffix — a
classic keyboard error), keeping only fields a real feed would carry
(name, nation, segment, balance). Linkage then runs with NO access to
the true key except as ground truth for the accuracy report.

The scale pattern is blocking, never all-pairs: candidates must share
(nationkey, mktsegment, first-5-digits-of-name) — keys the corruption
provably preserves — so comparisons are confined to O(block²) with
block size bounded by the prefix length (the knob: longer prefix,
smaller blocks). Within a block, candidates are scored by
``(levenshtein, |acctbal diff|, key)`` — name distance primary,
balance agreement as tie-breaker (Levenshtein is native codegen in
both engines; the float subtraction is a single IEEE op, compared,
never summed) — and the best match per dirty record is a
``min(struct(...))`` argmin: map-side partial-aggregable, no window
over the corpus (the pattern that replaced crossJoin+row_number in
``semantic_dedup``). A transposition is 2 substitutions, so the true
record is always in-block at dist <= 2 with balance diff 0; wrong
winners are real linkage hazards (a transposed id can EQUAL another
customer's id — dist 0 beats the truth's dist 2), which the accuracy
breakdown surfaces instead of hiding (measured 86% correct at
sf0.01 — TPC-H's dense sequential keyspace is the adversarial case
for digit-based matching).

Output: per (match_dist, is_correct) counts with key checksums —
compact, and any single mis-link moves a checksum.

Reference parity note: the reference's closest shape is the exact FK
lookup (``etl_process.py:117-142``, re-expressed in
``operators/joins.py``); this is its fuzzy generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# transposed 9-digit suffix: swap positions p, p+1 with p = 6 + key%3
_SPARK_DIRTY = (
    "concat(substr(d, 1, p - 1), substr(d, p + 1, 1),"
    " substr(d, p, 1), substr(d, p + 2, 9))"
)
_DUCK_DIRTY = (
    "substring(d, 1, p - 1) || substring(d, p + 1, 1)"
    " || substring(d, p, 1) || substring(d, p + 2, 9)"
)

_ORACLE = f"""
WITH clean AS (
  SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
         substring(c_name, 10, 9) AS d
  FROM customer
),
dirty AS (
  SELECT c_custkey AS dirty_id, c_nationkey, c_mktsegment,
         c_acctbal AS dirty_bal, {_DUCK_DIRTY} AS dd
  FROM (SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
               substring(c_name, 10, 9) AS d,
               CAST(6 + c_custkey % 3 AS INT) AS p
        FROM customer)
),
cand AS (
  SELECT dirty.dirty_id, clean.c_custkey,
         levenshtein(dirty.dd, clean.d) AS dist,
         abs(dirty.dirty_bal - clean.c_acctbal) AS bal_diff
  FROM dirty
  JOIN clean
    ON clean.c_nationkey = dirty.c_nationkey
   AND clean.c_mktsegment = dirty.c_mktsegment
   AND substring(clean.d, 1, 5) = substring(dirty.dd, 1, 5)
  WHERE levenshtein(dirty.dd, clean.d) <= 2
),
best AS (
  SELECT dirty_id, c_custkey, dist,
         ROW_NUMBER() OVER (PARTITION BY dirty_id
                            ORDER BY dist, bal_diff, c_custkey) AS rn
  FROM cand
)
SELECT CAST(dist AS INT) AS match_dist,
       c_custkey = dirty_id AS is_correct,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(dirty_id) AS BIGINT) AS dirty_key_sum,
       CAST(SUM(c_custkey) AS BIGINT) AS matched_key_sum
FROM best WHERE rn = 1
GROUP BY 1, 2
"""


@register("linkage_blocked_match", oracle=_ORACLE)
def linkage_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    clean = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        "c_acctbal",
        F.expr("substr(c_name, 10, 9)").alias("d"),
    )
    dirty = (
        cust.select(
            F.col("c_custkey").alias("dirty_id"),
            "c_nationkey",
            "c_mktsegment",
            F.col("c_acctbal").alias("dirty_bal"),
            F.expr("substr(c_name, 10, 9)").alias("d"),
            F.expr("CAST(6 + c_custkey % 3 AS INT)").alias("p"),
        )
        .select(
            "dirty_id",
            "c_nationkey",
            "c_mktsegment",
            "dirty_bal",
            F.expr(_SPARK_DIRTY).alias("dd"),
        )
    )
    # blocked candidate join: both sides scale with data -> shuffle
    # hash join on the block key, never a broadcast, never all-pairs
    cand = (
        dirty.join(
            clean,
            (dirty["c_nationkey"] == clean["c_nationkey"])
            & (dirty["c_mktsegment"] == clean["c_mktsegment"])
            & (F.expr("substr(d, 1, 5)") == F.expr("substr(dd, 1, 5)")),
        )
        .select(
            "dirty_id",
            "c_custkey",
            # threshold form (r20): banded DP, O(k*n) per candidate;
            # -1 past the bound, exact within it — kept rows identical
            F.levenshtein("dd", "d", 2).alias("dist"),
            F.abs(F.col("dirty_bal") - F.col("c_acctbal")).alias("bal_diff"),
        )
        .where(F.col("dist") >= 0)
    )
    best = cand.groupBy("dirty_id").agg(
        F.min(F.struct("dist", "bal_diff", "c_custkey")).alias("b")
    )
    return (
        best.select(
            "dirty_id",
            F.col("b.dist").cast("int").alias("match_dist"),
            F.col("b.c_custkey").alias("matched_key"),
        )
        .groupBy(
            "match_dist",
            (F.col("matched_key") == F.col("dirty_id")).alias("is_correct"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum("dirty_id").cast("long").alias("dirty_key_sum"),
            F.sum("matched_key").cast("long").alias("matched_key_sum"),
        )
    )
