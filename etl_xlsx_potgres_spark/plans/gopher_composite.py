"""Composite Gopher gate (Rae et al. 2021, Table A1) — the FULL rule
set as one map-only verdict (VERDICT r15 task 7): production
curation applies all the Gopher rules in a single pass and records
per-rule failure accounting; the split queries
(``gopher_quality``/``gopher_lines``/``text_quality_score``) each
attest one tier, this composes them into the per-document gate with
one boolean per rule, the failed-rule count, and the final
``gopher_pass`` verdict.

Rules (paper thresholds; per-document fail flags):
- word count outside [{WC_MIN}, {WC_MAX}] (fixture median 56 tokens
  straddles the 50 floor — fires both ways);
- mean word length outside [{MWL_MIN}, {MWL_MAX}];
- fewer than {STOP_MIN} distinct stop words — the paper's list plus
  ``'a'`` (a standard English stop word) because the synthetic
  fixture's vocabulary contains only ``the``/``a`` from the paper's
  eight, and a rule that can never pass would make the composite
  one-way vacuous;
- duplicate-token fraction > {DUP_TOKEN_MAX} (``gopher_quality``);
- top-bigram fraction > {TOP_BIGRAM_MAX} — computed ROW-LOCALLY here
  (multiplicity scan over the row's own bigram array, O(distinct x n)
  per row) instead of ``gopher_quality``'s (doc, bigram) shuffle:
  the composite's contract is ZERO Exchanges, and document length
  bounds the quadratic term;
- duplicate line / line-char-mass / paragraph / paragraph-char-mass
  fractions over the SAME deterministic multi-line synthesis as
  ``quality_gopher_lines`` (identical ``_DUCK_LINES``/``_SPARK_LINES``
  expressions imported, so the two queries cannot drift).

Plan shape: every rule is a higher-order array function over the
row's own tokens — the aggregation grain equals the row grain, so
the query is map-only with zero Exchanges at any corpus size
(pinned in ``tests/test_shuffle_budget.py``).  All counts are exact
bigints; ratios are single exact divisions (IEEE-identical on both
engines); NULL guards use the COALESCE(flag, FALSE) policy.

Reference lifecycle note: the reference has no corpus stage
(``etl_process.py:1-235``); this completes the rule-based curation
tier as the single-pass gate a 100-TB pipeline actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .importance_sampling import _DUCK_TOKS, _SPARK_TOKS
from .gopher_quality import DUP_TOKEN_MAX, TOP_BIGRAM_MAX, _DUCK_BIGRAMS
from .gopher_lines import (
    DUP_LINE_CHAR_MAX,
    DUP_LINE_MAX,
    DUP_PARA_CHAR_MAX,
    DUP_PARA_MAX,
    _DUCK_LINES,
    _DUCK_PARAS,
    _SPARK_LINES,
    _SPARK_PARAS,
    _duck_chars,
    _spark_chars,
)

WC_MIN, WC_MAX = 50, 100000
MWL_MIN, MWL_MAX = 3.0, 10.0
STOP_MIN = 2
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with", "a")

_STOP_SQL_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)

# row-local top-bigram multiplicity (no (doc, bigram) shuffle)
_SPARK_TOP_BIGRAM = """
CASE WHEN size(bigrams) > 0 THEN
  array_max(transform(array_distinct(bigrams),
    b -> size(filter(bigrams, x -> x = b))))
END
"""
_DUCK_TOP_BIGRAM = """
CASE WHEN len(bigrams) > 0 THEN
  list_max(list_transform(list_distinct(bigrams),
    b -> len(list_filter(bigrams, x -> x = b))))
END
"""

_SPARK_BIGRAMS = """
zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),
         slice(toks, 2, greatest(size(toks) - 1, 0)),
         (a, b) -> concat(a, ' ', b))
"""


# the shared rule expressions over the metric columns — written ONCE
# in portable SQL (engine differences live in the metric CTEs, not
# here); each entry is one SELECT-list expression
_FLAG_EXPRS = [
    f"n_tokens < {WC_MIN} OR n_tokens > {WC_MAX} AS fail_word_count",
    f"COALESCE(mean_word_len < {MWL_MIN} OR mean_word_len > {MWL_MAX},"
    f" TRUE) AS fail_mean_word_len",
    f"n_stopwords < {STOP_MIN} AS fail_stopwords",
    f"COALESCE(CASE WHEN n_tokens > 0"
    f" THEN 1.0 - CAST(nd_tokens AS DOUBLE) / n_tokens END"
    f" > {DUP_TOKEN_MAX}, FALSE) AS fail_dup_tokens",
    f"COALESCE(CASE WHEN n_bigrams > 0"
    f" THEN CAST(top_bigram_n AS DOUBLE) / n_bigrams END"
    f" > {TOP_BIGRAM_MAX}, FALSE) AS fail_top_bigram",
    f"COALESCE(CASE WHEN n_lines > 0"
    f" THEN CAST(n_lines - nd_lines AS DOUBLE) / n_lines END"
    f" > {DUP_LINE_MAX}, FALSE) AS fail_dup_lines",
    f"COALESCE(CASE WHEN c_lines > 0"
    f" THEN CAST(c_lines - cd_lines AS DOUBLE) / c_lines END"
    f" > {DUP_LINE_CHAR_MAX}, FALSE) AS fail_dup_line_chars",
    f"COALESCE(CASE WHEN n_paras > 0"
    f" THEN CAST(n_paras - nd_paras AS DOUBLE) / n_paras END"
    f" > {DUP_PARA_MAX}, FALSE) AS fail_dup_paras",
    f"COALESCE(CASE WHEN c_paras > 0"
    f" THEN CAST(c_paras - cd_paras AS DOUBLE) / c_paras END"
    f" > {DUP_PARA_CHAR_MAX}, FALSE) AS fail_dup_para_chars",
]


_FAIL_COLS = [
    "fail_word_count", "fail_mean_word_len", "fail_stopwords",
    "fail_dup_tokens", "fail_top_bigram", "fail_dup_lines",
    "fail_dup_line_chars", "fail_dup_paras", "fail_dup_para_chars",
]

_N_FAILED_SQL = " + ".join(
    f"CASE WHEN {c} THEN 1 ELSE 0 END" for c in _FAIL_COLS
)

_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
),
stru AS (
  SELECT doc_id, toks, {_DUCK_BIGRAMS} AS bigrams, lines,
         {_DUCK_PARAS} AS paras
  FROM (SELECT doc_id, toks, {_DUCK_LINES} AS lines FROM base)
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS nd_tokens,
         CASE WHEN len(toks) > 0 THEN
           CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
             / len(toks) END AS mean_word_len,
         CAST(len(list_filter([{_STOP_SQL_LIST}],
              s -> list_contains(toks, s))) AS BIGINT) AS n_stopwords,
         CAST(len(bigrams) AS BIGINT) AS n_bigrams,
         CAST(COALESCE({_DUCK_TOP_BIGRAM}, 0) AS BIGINT) AS top_bigram_n,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_distinct(lines)) AS BIGINT) AS nd_lines,
         {_duck_chars('lines')} AS c_lines,
         {_duck_chars('list_distinct(lines)')} AS cd_lines,
         CAST(len(paras) AS BIGINT) AS n_paras,
         CAST(len(list_distinct(paras)) AS BIGINT) AS nd_paras,
         {_duck_chars('paras')} AS c_paras,
         {_duck_chars('list_distinct(paras)')} AS cd_paras
  FROM stru
),
flagged AS (
  SELECT doc_id, n_tokens, n_stopwords, {', '.join(_FLAG_EXPRS)}
  FROM m
)
SELECT doc_id, n_tokens, n_stopwords, {', '.join(_FAIL_COLS)},
       CAST({_N_FAILED_SQL} AS BIGINT) AS n_rules_failed,
       ({_N_FAILED_SQL}) = 0 AS gopher_pass
FROM flagged
"""


@register("quality_gopher_composite", oracle=_ORACLE)
def quality_gopher_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stru = (
        d.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
        .withColumn("bigrams", F.expr(_SPARK_BIGRAMS))
        .withColumn("lines", F.expr(_SPARK_LINES))
        .withColumn("paras", F.expr(_SPARK_PARAS))
    )
    stop_arr = "array(" + _STOP_SQL_LIST + ")"
    m = stru.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("nd_tokens"),
        F.expr(
            "CASE WHEN size(toks) > 0 THEN"
            " CAST(aggregate(transform(toks, x -> length(x)), 0L,"
            " (acc, x) -> acc + CAST(x AS BIGINT)) AS DOUBLE)"
            " / size(toks) END"
        ).alias("mean_word_len"),
        F.expr(
            f"CAST(size(filter({stop_arr},"
            f" s -> array_contains(toks, s))) AS BIGINT)"
        ).alias("n_stopwords"),
        F.size("bigrams").cast("long").alias("n_bigrams"),
        F.expr(f"CAST(COALESCE({_SPARK_TOP_BIGRAM}, 0) AS BIGINT)").alias(
            "top_bigram_n"
        ),
        F.size("lines").cast("long").alias("n_lines"),
        F.size(F.array_distinct("lines")).cast("long").alias("nd_lines"),
        F.expr(_spark_chars("lines")).alias("c_lines"),
        F.expr(_spark_chars("array_distinct(lines)")).alias("cd_lines"),
        F.size("paras").cast("long").alias("n_paras"),
        F.size(F.array_distinct("paras")).cast("long").alias("nd_paras"),
        F.expr(_spark_chars("paras")).alias("c_paras"),
        F.expr(_spark_chars("array_distinct(paras)")).alias("cd_paras"),
    )
    flagged = m.selectExpr(
        "doc_id", "n_tokens", "n_stopwords", *_FLAG_EXPRS
    )
    return flagged.selectExpr(
        "doc_id",
        "n_tokens",
        "n_stopwords",
        *_FAIL_COLS,
        f"CAST({_N_FAILED_SQL} AS BIGINT) AS n_rules_failed",
        f"({_N_FAILED_SQL}) = 0 AS gopher_pass",
    )
