"""Tokenizer-aware chunking (VERDICT r15 task 5) — chunk boundaries
derived from LEARNED BPE token budgets instead of fixed word windows:
the production pre-tokenization chunker packs text by what the model
will actually pay for (BPE tokens), not by whitespace word counts,
because a 512-token context budget overflows on morphology-heavy text
if chunks are sized in words.

Token cost: each word's symbol count AFTER applying the
``text_bpe_merge_rounds`` learned merges (``plans/bpe_train``'s exact
replace semantics, applied per occurrence with the 3 trained
(pair, merged) winners as 1-row broadcasts — no vocabulary join, so
the costing is row-local and the vocab frame never moves).

Chunk rule (the ``pack_sequences_stats`` floor-div convention): word
``i`` belongs to chunk ``prefix_cost_before_i DIV {BUDGET}`` — a pure
function of the exact bigint prefix sums, so boundaries derive from
token counts and the pair is bit-identical at any partitioning.  A
greedy reset-at-boundary packer is sequential by definition; the
floor-div rule gives the same ~BUDGET-sized chunks while staying a
closed-form expression both engines state identically.

Dual implementation, mutually pinned through ONE oracle:
- ``text_chunk_token_budget`` — pure JVM, word-count gated (r17):
  docs under ``LONG_DOC_WORDS`` use row-local higher-order array
  functions (O(n_words^2) slices per row, shuffle-free); book-length
  docs take the explode+window running-sum path (linear per doc, the
  shuffle confined to long docs' tokens);
- ``text_chunk_token_budget_udtf`` — the Arrow UDTF escape hatch
  (``chunk_udtf``'s lateral-join shape) receiving the trained merges
  as an argument; the Python loop must reproduce the JVM chunker
  byte-for-byte or the shared oracle hash breaks.

Plan shape: the only corpus-scale shuffle is BPE training's word
count (shared subtree); costing + chunking are map-only over
documents; each round's winner is a 1-row broadcast.

Reference lifecycle note: the reference has no corpus stage
(``etl_process.py:1-235``); this upgrades the chunking family
(JVM window chunker, UDTF twin) to the tokenizer-aware form a
training-data pipeline runs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..registry import register
from ..sources import load_table
from .bpe_train import (
    N_MERGE_ROUNDS,
    _DUCK_TOKENS,
    _SPARK_TOKENS,
    _TRAIN_CTES,
    _merge_rounds,
    _word_counts,
)

BUDGET = 64  # BPE tokens per chunk


def _cost_expr(engine: str) -> str:
    """Per-word BPE token cost: char-split repr -> the N learned
    merges applied exactly as training does (pad, replace, trim) ->
    symbol count.  ``p{k}``/``m{k}`` are the space-padded pair/merged
    columns provided by the 1-row merges frame."""
    if engine == "spark":
        split_chars = (
            "array_join(transform(sequence(1, length(w)),"
            " i -> substring(w, i, 1)), ' ')"
        )
        r = split_chars
        for k in range(1, N_MERGE_ROUNDS + 1):
            r = f"trim(replace(concat(' ', {r}, ' '), p{k}, m{k}))"
        return (
            f"transform(toks, w -> CAST(size(split({r}, ' ')) AS BIGINT))"
        )
    split_chars = (
        "array_to_string(list_transform(generate_series(1, length(w)),"
        " i -> substring(w, i, 1)), ' ')"
    )
    r = split_chars
    for k in range(1, N_MERGE_ROUNDS + 1):
        r = f"trim(replace(' ' || {r} || ' ', p{k}, m{k}))"
    return (
        f"list_transform(toks, w ->"
        f" CAST(len(string_split({r}, ' ')) AS BIGINT))"
    )


_MG_COLS = ", ".join(
    f"(SELECT ' ' || pair || ' ' FROM t{k}) AS p{k},"
    f" (SELECT ' ' || merged || ' ' FROM t{k}) AS m{k}"
    for k in range(1, N_MERGE_ROUNDS + 1)
)

_ORACLE = f"""
WITH {_TRAIN_CTES},
mg AS (SELECT {_MG_COLS}),
base AS (
  SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
  WHERE len({_DUCK_TOKENS}) > 0
),
costed AS (
  SELECT doc_id, toks, {_cost_expr('duck')} AS costs
  FROM base CROSS JOIN mg
),
prefixed AS (
  SELECT doc_id, toks, costs,
         list_transform(generate_series(1, len(costs)),
           i -> CAST(COALESCE(list_sum(list_slice(costs, 1, i - 1)), 0)
                AS BIGINT) // {BUDGET}) AS cids
  FROM costed
),
chunks AS (
  SELECT doc_id,
         list_transform(list_sort(list_distinct(cids)), c -> struct_pack(
           chunk_id := CAST(c AS BIGINT),
           n_words := CAST(len(list_filter(generate_series(1, len(toks)),
                           i -> cids[i] = c)) AS BIGINT),
           n_bpe_tokens := CAST(COALESCE(list_sum(list_transform(
                           list_filter(generate_series(1, len(toks)),
                             i -> cids[i] = c), i -> costs[i])), 0)
                           AS BIGINT),
           chunk_text := array_to_string(list_transform(
                           list_filter(generate_series(1, len(toks)),
                             i -> cids[i] = c), i -> toks[i]), ' ')
         )) AS chs
  FROM prefixed
)
SELECT doc_id, ch.chunk_id AS chunk_id, ch.n_words AS n_words,
       ch.n_bpe_tokens AS n_bpe_tokens, ch.chunk_text AS chunk_text
FROM (SELECT doc_id, unnest(chs) AS ch FROM chunks)
"""

_SPARK_CHUNKS = f"""
transform(array_sort(array_distinct(cids)), c -> named_struct(
  'chunk_id', CAST(c AS BIGINT),
  'n_words', CAST(size(filter(z, s -> s.cids = c)) AS BIGINT),
  'n_bpe_tokens', aggregate(filter(z, s -> s.cids = c), 0L,
                            (a, s) -> a + s.costs),
  'chunk_text', array_join(transform(filter(z, s -> s.cids = c),
                                     s -> s.toks), ' ')))
"""


def _merges_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row frame (p1, m1, ..., pN, mN): the trained winners, space-
    padded exactly as the training replace expects."""
    tops = _merge_rounds(_word_counts(spark, sf_dir))
    mrow = None
    for k, top in enumerate(tops, start=1):
        cur = top.select(
            F.concat(F.lit(" "), F.col("pair"), F.lit(" ")).alias(f"p{k}"),
            F.concat(F.lit(" "), F.col("merged"), F.lit(" ")).alias(f"m{k}"),
        )
        # 1-row winner frames (the bpe_train broadcast contract)
        mrow = cur if mrow is None else mrow.crossJoin(F.broadcast(cur))
    return mrow


# Word-count gate between the two physical strategies: the row-local
# HOF path computes each word's prefix sum with an O(n) slice fold —
# O(n^2) per document, shuffle-free and fastest for the short docs
# that dominate web corpora; past the gate the per-doc cost knees
# (~1e3 words, VERDICT r16 #5), so book-length documents take the
# explode+window path: one running-sum window partitioned by doc_id —
# linear per document, at the price of shuffling only the LONG docs'
# tokens. Both paths evaluate the identical closed-form floor-div
# rule over exact bigint prefix sums, so the split is invisible to
# the oracle (and a property test pins long-doc output against the
# UDTF twin byte-for-byte).
LONG_DOC_WORDS = 512


def _costed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import scoped_persist

    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.expr(_SPARK_TOKENS).alias("toks")).filter(
        F.size("toks") > 0
    )
    # the 1-row merges frame is persisted because BOTH gate branches
    # consume this costed frame: without the barrier each branch's
    # subtree carries its own copy of the entire BPE-training pipeline
    # (the corpus word-count shuffle runs twice — seen in the r17 plan
    # audit, 16 Exchanges vs 8)
    merges_row_df = scoped_persist(_merges_row(spark, sf_dir))
    return base.crossJoin(F.broadcast(merges_row_df)).select(
        "doc_id", "toks", F.expr(_cost_expr("spark")).alias("costs")
    )


def _chunked_short(costed: DataFrame) -> DataFrame:
    """Row-local HOF chunker for docs under the gate (no shuffle)."""
    # one-pass struct-accumulator fold (r20): the old per-element
    # slice+fold recomputed each prefix from scratch — O(n_words^2)
    # interpreted adds per document; the accumulator carries (running
    # sum, emitted cids) so each element costs one add plus a
    # concat(acc.a, array(...)) — the concat still copies the
    # accumulator array, so memory ops stay O(n^2) per doc (bounded by
    # the LONG_DOC_WORDS gate); the win is dropping the O(n^2)
    # interpreted ADDS (bit-identical: same exact bigint prefix sums,
    # A/B'd at sf0.1 with 0 differing rows; isolated cids stage ~3x
    # faster)
    prefixed = costed.filter(F.size("costs") < LONG_DOC_WORDS).select(
        "doc_id",
        "toks",
        "costs",
        F.expr(
            f"aggregate(costs,"
            f" struct(0L AS s, CAST(array() AS ARRAY<BIGINT>) AS a),"
            f" (acc, x) -> struct(acc.s + x,"
            f"                    concat(acc.a, array(acc.s DIV {BUDGET}))),"
            f" acc -> acc.a)"
        ).alias("cids"),
    )
    zipped = prefixed.select(
        "doc_id",
        F.expr("arrays_zip(toks, costs, cids)").alias("z"),
        "cids",
    )
    return (
        zipped.select("doc_id", F.explode(F.expr(_SPARK_CHUNKS)).alias("ch"))
        .select(
            "doc_id",
            F.col("ch.chunk_id").alias("chunk_id"),
            F.col("ch.n_words").alias("n_words"),
            F.col("ch.n_bpe_tokens").alias("n_bpe_tokens"),
            F.col("ch.chunk_text").alias("chunk_text"),
        )
    )


def _chunked_long(costed: DataFrame) -> DataFrame:
    """Explode+window chunker for book-length docs: ONE running-sum
    window per document (exclusive frame = the same prefix-before-i
    the HOF path slices for), then a (doc_id, chunk_id) aggregate
    whose order-sensitive text rebuild sorts the collected (pos, tok)
    structs row-locally — linear in document length."""
    from pyspark.sql import Window

    ex = costed.filter(F.size("costs") >= LONG_DOC_WORDS).select(
        "doc_id", F.posexplode(F.arrays_zip("toks", "costs")).alias("pos", "s")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = ex.select(
        "doc_id",
        "pos",
        F.col("s.toks").alias("tok"),
        F.col("s.costs").alias("cost"),
        F.coalesce(F.sum("s.costs").over(w), F.lit(0)).alias("prefix"),
    )
    return (
        pre.withColumn("chunk_id", F.expr(f"prefix DIV {BUDGET}"))
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("cost").cast("long").alias("n_bpe_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("chunk_text"),
        )
        .select("doc_id", "chunk_id", "n_words", "n_bpe_tokens", "chunk_text")
    )


def _chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import scoped_persist

    # ONE corpus scan for both gate branches (VERDICT r17 #6): without
    # the barrier each branch's subtree re-reads documents AND re-runs
    # the per-word merge-replace costing — the expensive half of the
    # query — once per branch; the cached frame makes the gate filters
    # two cheap passes over already-costed rows (the r17 dual-path
    # insurance at half the price)
    costed = scoped_persist(_costed(spark, sf_dir))
    return _chunked_short(costed).unionByName(_chunked_long(costed))


@register("text_chunk_token_budget", oracle=_ORACLE)
def text_chunk_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _chunked(spark, sf_dir)


@udtf(
    returnType="chunk_id: bigint, n_words: bigint, n_bpe_tokens: bigint,"
    " chunk_text: string",
    useArrow=True,
)
class ChunkBpeUdtf:
    """One document + the trained merges (alternating
    [pair1, merged1, ...]) -> token-budget chunks.  Must reproduce the
    JVM chunker byte-for-byte: Java-\\s tokenization, training's
    pad/replace/trim merge semantics, the floor-div budget rule."""

    def eval(self, text: str, merges: list):
        toks = [
            t
            for t in re.split(r"[ \t\n\x0b\f\r]+", (text or "").lower())
            if t
        ]
        if not toks:
            return
        pairs = [
            (merges[2 * i], merges[2 * i + 1])
            for i in range(len(merges) // 2)
        ]

        def cost(w: str) -> int:
            r = " ".join(w)
            for p, m in pairs:
                r = (" " + r + " ").replace(
                    " " + p + " ", " " + m + " "
                ).strip()
            return len(r.split(" "))

        costs = [cost(w) for w in toks]
        prefix = 0
        chunks: dict[int, list[int]] = {}
        order: list[int] = []
        for i, c in enumerate(costs):
            cid = prefix // BUDGET
            if cid not in chunks:
                chunks[cid] = []
                order.append(cid)
            chunks[cid].append(i)
            prefix += c
        for cid in sorted(order):
            idx = chunks[cid]
            yield (
                cid,
                len(idx),
                sum(costs[i] for i in idx),
                " ".join(toks[i] for i in idx),
            )


@register("text_chunk_token_budget_udtf", oracle=_ORACLE)
def text_chunk_token_budget_udtf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    spark.udtf.register("chunk_bpe_udtf", ChunkBpeUdtf)
    d = load_table(spark, sf_dir, "documents")
    d.select("doc_id", "text").createOrReplaceTempView("docs_for_bpe_chunk")
    # un-pad the stored ' pair ' / ' merged ' columns back to the raw
    # strings — the UDTF re-pads exactly as the JVM replace does
    merges = _merges_row(spark, sf_dir).select(
        F.array(
            *[
                F.expr(f"substring({c}{k}, 2, length({c}{k}) - 2)")
                for k in range(1, N_MERGE_ROUNDS + 1)
                for c in ("p", "m")
            ]
        ).alias("merges")
    )
    merges.createOrReplaceTempView("bpe_merges_for_chunk")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_words, c.n_bpe_tokens, c.chunk_text
        FROM docs_for_bpe_chunk d
        CROSS JOIN bpe_merges_for_chunk m,
        LATERAL chunk_bpe_udtf(d.text, m.merges) c
        """
    )
