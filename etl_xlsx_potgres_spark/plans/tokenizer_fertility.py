"""Tokenizer fertility audit — tokens-per-word and chars-per-token by
language, THE health metric of a tokenizer/corpus pairing (fertility
is the standard term in the multilingual-tokenization literature,
e.g. the mBERT/XLM-R analyses and the BLOOM tokenizer report: a
tokenizer "spends" far more tokens per word on languages it was not
trained for, which inflates effective sequence lengths and skews
compute budgets).  A curation pipeline tracks this per language per
snapshot; a fertility spike means the tokenizer no longer fits the
corpus mix.

Costing: the SAME trained-BPE word cost as ``text_chunk_token_budget``
(``plans/bpe_train``'s merge rounds applied per occurrence via 1-row
winner broadcasts — no vocab join), so this query audits the
tokenizer the chunking family actually applies, not a proxy.

Plan shape: the only corpus-scale shuffles are BPE training's shared
word-count subtree and ONE per-language rollup of exact bigint sums
(words, chars, BPE tokens — all map-side combined).  Fertility and
chars-per-token are single exact divisions of exact bigints, so the
pair is bit-identical on both engines at any partitioning.

Reference lifecycle note: the reference (etl_process.py:1-235) has no
tokenizer surface; this closes the loop on the BPE family the driver
mandates (train -> encode -> chunk -> AUDIT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .bpe_train import _DUCK_TOKENS, _SPARK_TOKENS, _TRAIN_CTES
from .chunk_token_budget import _MG_COLS, _cost_expr, _merges_row


@register(
    "text_tokenizer_fertility",
    oracle=f"""
    WITH {_TRAIN_CTES},
    mg AS (SELECT {_MG_COLS}),
    base AS (
      SELECT doc_id, lang, {_DUCK_TOKENS} AS toks FROM documents
      WHERE len({_DUCK_TOKENS}) > 0
    ),
    costed AS (
      SELECT lang,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(COALESCE(list_sum(list_transform(toks, w -> len(w))), 0)
                  AS BIGINT) AS n_chars,
             CAST(COALESCE(list_sum({_cost_expr('duck')}), 0)
                  AS BIGINT) AS n_bpe
      FROM base CROSS JOIN mg
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_words) AS BIGINT)
             AS fertility,
           CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_bpe) AS BIGINT)
             AS chars_per_token
    FROM costed
    GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "lang", F.expr(_SPARK_TOKENS).alias("toks")
    ).filter(F.size("toks") > 0)
    costed = base.crossJoin(
        F.broadcast(_merges_row(spark, sf_dir))
    ).select(
        "lang",
        F.size("toks").cast("long").alias("n_words"),
        F.expr(
            "aggregate(transform(toks, w -> length(w)), 0L,"
            " (a, x) -> a + CAST(x AS BIGINT))"
        ).alias("n_chars"),
        F.expr(
            f"aggregate({_cost_expr('spark')}, 0L, (a, x) -> a + x)"
        ).alias("n_bpe"),
    )
    return costed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
        (
            F.sum("n_bpe").cast("double") / F.sum("n_words").cast("long")
        ).alias("fertility"),
        (
            F.sum("n_chars").cast("double") / F.sum("n_bpe").cast("long")
        ).alias("chars_per_token"),
    )
