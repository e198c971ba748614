"""Text-analysis queries over the documents table: token counting,
quality scoring, language ID, fingerprinting — the per-document stage
of an LLM training-data pipeline. Embarrassingly parallel (no
shuffles except final aggregates): at 100 TB this is a single
map-only pass per document partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    CJK_RANGE,
    LANG_MARKERS,
    fingerprint,
    normalize_text,
    shingles_long,
    token_count,
    tokens,
)
from ..registry import register
from ..sources import load_table
from .dedup_fuzzy import _DUCK_SHINGLES

_DUCK_TOKENS = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"


# GPT-2-style pretokenizer, portability-constrained: contraction
# suffixes, space-prefixed letter/digit/punctuation runs, whitespace
# runs. Deliberately lookahead-free so Java regex (Spark) and RE2
# (DuckDB) tokenize identically — the real GPT-2 pattern's `(?!\S)`
# can't cross engines. This is the per-document token-budget signal a
# pretraining pipeline bins and caps on before the (model-specific)
# exact BPE merge pass.
_BPE_PAT = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
_BPE_PAT_SQL = _BPE_PAT.replace("'", "''")


@register(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS n_bpe_tokens,
           len(list_filter(regexp_extract_all(text, '{_BPE_PAT_SQL}'),
                           t -> trim(t) <> '')) AS n_content_tokens,
           CASE WHEN len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) > 0
                THEN CAST(length(text) AS DOUBLE)
                     / len(regexp_extract_all(text, '{_BPE_PAT_SQL}'))
           END AS chars_per_token
    FROM documents
    """,
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(_BPE_PAT), F.lit(0))
    n = F.size(toks)
    content = F.size(F.filter(toks, lambda t: F.trim(t) != ""))
    return d.select(
        "doc_id",
        n.alias("n_bpe_tokens"),
        content.alias("n_content_tokens"),
        F.when(n > 0, F.length("text").cast("double") / n).alias(
            "chars_per_token"
        ),
    )


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len({_DUCK_TOKENS}) AS n_tokens,
           length(text) AS n_chars,
           len(list_distinct({_DUCK_TOKENS})) AS n_unique_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    from ..operators.text import tokens

    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.size(F.array_distinct(tokens("text"))).alias("n_unique_tokens"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, n_tokens, punct_ratio, stopword_ratio, digit_ratio,
           0.4 * least(n_tokens / 100.0, 1.0)
           + 0.3 * (1.0 - punct_ratio)
           + 0.3 * least(stopword_ratio * 5.0, 1.0) AS quality
    FROM (
      SELECT doc_id,
             len({_DUCK_TOKENS}) AS n_tokens,
             len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0
               / greatest(length(text), 1) AS punct_ratio,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is)\\b')) * 1.0
               / greatest(len({_DUCK_TOKENS}), 1) AS stopword_ratio,
             len(regexp_extract_all(text, '[0-9]')) * 1.0
               / greatest(length(text), 1) AS digit_ratio
      FROM documents
    )
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tokens = token_count("text")
    n_chars = F.greatest(F.length("text"), F.lit(1))
    punct = F.regexp_count("text", F.lit(r"[^\w\s]")) * 1.0 / n_chars
    stop = (
        F.regexp_count(F.lower("text"), F.lit(LANG_MARKERS["en"]))
        * 1.0
        / F.greatest(n_tokens, F.lit(1))
    )
    digit = F.regexp_count("text", F.lit("[0-9]")) * 1.0 / n_chars
    base = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        punct.alias("punct_ratio"),
        stop.alias("stopword_ratio"),
        digit.alias("digit_ratio"),
    )
    quality = (
        0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + 0.3 * (1.0 - F.col("punct_ratio"))
        + 0.3 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    )
    return base.withColumn("quality", quality)


# ---------------------------------------------------------------- lang ID
#
# The synthetic documents carry a `lang` label over language-NEUTRAL
# text (one shared vocabulary), so any content-based identifier is
# blind on the raw fixture — the r16 confusion audit proved the
# heuristic routed 100% of documents to 'en'. The fixture is driver-
# owned, so the marker-bearing surface the label claims is derived
# IN-QUERY (the same seeded-synthesis discipline as gopher_lines'
# multi-line pages and bloom's undersized filter): a deterministic
# per-token localization replaces the shared function words
# ('the'/'a') with the label language's article, and injects one of 8
# language-typical function words at pseudo-random positions
# ((p*37 + doc_id) % 9 == 0 — about one token in nine). The word
# lists deliberately contain genuine cross-language collisions ('des'
# is German genitive AND a French article; 'la'/'de' are Spanish AND
# French function words), and short documents can draw zero markers —
# so the identifier sees realistic confusable text and the confusion
# matrix is non-trivial: off-diagonal mass appears for de→fr, fr→es,
# and low-signal→en, and a regression in the identifier moves
# hash-checked rates. The identifier itself (marker counts + tiebreak
# cascade) never sees the label.
_LOC_WORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "on", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "des", "ein"],
    "es": ["el", "la", "de", "que", "los", "es", "un", "con"],
    "fr": ["le", "les", "et", "des", "est", "une", "la", "de"],
    "zh": ["的", "是", "了", "在", "和", "有", "不", "人"],
}
_LOC_ARTICLE = {"en": "the", "de": "der", "es": "el", "fr": "le", "zh": "的"}
_LOC_INDEF = {"en": "a", "de": "ein", "es": "un", "fr": "une", "zh": "一"}


def _localized_text_col() -> F.Column:
    """Spark twin of _DUCK_LOC_SQL: deterministic localization of the
    `text` column by the `lang` label (pure Catalyst — transform with
    index + literal-array element_at; no UDF)."""

    def word_case(choices) -> F.Column:
        expr = None
        for lang, val in choices:
            cond = F.col("lang") == lang
            expr = (
                F.when(cond, val) if expr is None else expr.when(cond, val)
            )
        return expr

    def one_token(t: F.Column, i: F.Column) -> F.Column:
        p = i + 1
        inject = (p * 37 + F.col("doc_id")) % 9 == 0
        idx = ((F.col("doc_id") + p) % 8 + 1).cast("int")
        marker = word_case(
            [
                (lang, F.element_at(F.array(*[F.lit(w) for w in words]), idx))
                for lang, words in _LOC_WORDS.items()
            ]
        ).otherwise(t)
        article = word_case(
            [(lang, F.lit(w)) for lang, w in _LOC_ARTICLE.items()]
        ).otherwise(t)
        indef = word_case(
            [(lang, F.lit(w)) for lang, w in _LOC_INDEF.items()]
        ).otherwise(t)
        return (
            F.when(inject, marker)
            .when(t == "the", article)
            .when(t == "a", indef)
            .otherwise(t)
        )

    toks = F.split(F.trim(F.col("text")), r"\s+")
    return F.concat_ws(" ", F.transform(toks, one_token))


def _duck_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _duck_lang_case(choices: list[tuple[str, str]]) -> str:
    whens = " ".join(f"WHEN '{lang}' THEN {val}" for lang, val in choices)
    return f"CASE lang {whens} ELSE toks[p] END"


_DUCK_LOC_SQL = f"""array_to_string(list_transform(
      generate_series(1, len(toks)),
      p -> CASE
        WHEN (p * 37 + doc_id) % 9 = 0 THEN {_duck_lang_case([
            (lang, f"list_extract({_duck_list(words)}, "
                   f"CAST((doc_id + p) % 8 + 1 AS INT))")
            for lang, words in _LOC_WORDS.items()
        ])}
        WHEN toks[p] = 'the' THEN {_duck_lang_case(
            [(lang, f"'{w}'") for lang, w in _LOC_ARTICLE.items()]
        )}
        WHEN toks[p] = 'a' THEN {_duck_lang_case(
            [(lang, f"'{w}'") for lang, w in _LOC_INDEF.items()]
        )}
        ELSE toks[p] END), ' ')"""

# the localized corpus as a reusable CTE body (text replaced by its
# marker-bearing derivation; consumed by text_lang_id and, through its
# oracle, text_lang_confusion)
_DUCK_LOC_DOCS = f"""
    tok AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    loc AS (
      SELECT doc_id, lang, {_DUCK_LOC_SQL} AS text FROM tok
    )"""


@register(
    "text_lang_id",
    oracle=f"""
    WITH {_DUCK_LOC_DOCS}
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN c_zh > 0 THEN 'zh'
                WHEN c_en >= greatest(c_de, c_es, c_fr) THEN 'en'
                WHEN c_de >= greatest(c_es, c_fr) THEN 'de'
                WHEN c_es >= c_fr THEN 'es'
                ELSE 'fr' END AS predicted_lang,
           c_en, c_de, c_es, c_fr
    FROM (
      SELECT doc_id, lang,
             len(regexp_extract_all(lower(text), '{LANG_MARKERS["en"]}')) AS c_en,
             len(regexp_extract_all(lower(text), '{LANG_MARKERS["de"]}')) AS c_de,
             len(regexp_extract_all(lower(text), '{LANG_MARKERS["es"]}')) AS c_es,
             len(regexp_extract_all(lower(text), '{LANG_MARKERS["fr"]}')) AS c_fr,
             len(regexp_extract_all(text, '{CJK_RANGE}')) AS c_zh
      FROM loc
    )
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", _localized_text_col().alias("text")
    )
    low = F.lower("text")
    counts = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.regexp_count(low, F.lit(LANG_MARKERS["en"])).cast("long").alias("c_en"),
        F.regexp_count(low, F.lit(LANG_MARKERS["de"])).cast("long").alias("c_de"),
        F.regexp_count(low, F.lit(LANG_MARKERS["es"])).cast("long").alias("c_es"),
        F.regexp_count(low, F.lit(LANG_MARKERS["fr"])).cast("long").alias("c_fr"),
        F.regexp_count(F.col("text"), F.lit(CJK_RANGE)).cast("long").alias("c_zh"),
    )
    pred = (
        F.when(F.col("c_zh") > 0, "zh")
        .when(F.col("c_en") >= F.greatest("c_de", "c_es", "c_fr"), "en")
        .when(F.col("c_de") >= F.greatest("c_es", "c_fr"), "de")
        .when(F.col("c_es") >= F.col("c_fr"), "es")
        .otherwise("fr")
    )
    return counts.select(
        "doc_id",
        "labeled_lang",
        pred.alias("predicted_lang"),
        "c_en",
        "c_de",
        "c_es",
        "c_fr",
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                   '\\s+', ' ', 'g'))) AS fp,
           length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                                      '\\s+', ' ', 'g'))) AS normalized_len
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        F.length(normalize_text("text")).alias("normalized_len"),
    )


# Corpus-level rollup: per-language document stats — the shape of a
# corpus QA report (one small shuffle on lang).
@register(
    "text_corpus_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(len({_DUCK_TOKENS})) AS BIGINT) AS total_tokens,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(token_count("text")).alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


# Repetition quality signals (the Gopher/C4 family): fraction of mass
# taken by the single most frequent token, and the duplicate-3-gram
# fraction. Both are long-form explode + groupBy shapes (no
# interpreted per-row HOFs) — one shuffle on (doc_id, token) and one
# on (doc_id, shingle), the same plan at any corpus size. High values
# flag boilerplate/spam documents for the curation gate.
@register(
    "text_repetition_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS tok FROM documents
    ),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
    per AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
             CAST(MAX(c) AS BIGINT) AS max_tok
      FROM tc GROUP BY doc_id
    ),
    sh AS (
      SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM documents
    ),
    shc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh,
             CAST(COUNT(DISTINCT s) AS BIGINT) AS n_dist
      FROM sh GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_toks,
           CAST(p.max_tok AS DOUBLE) / p.n_toks AS top_tok_frac,
           COALESCE(1.0 - CAST(s.n_dist AS DOUBLE) / s.n_sh, 0.0) AS dup3_frac
    FROM per p LEFT JOIN shc s USING (doc_id)
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tc = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    per = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_toks"),
        F.max("c").cast("long").alias("max_tok"),
    )
    sh = shingles_long(d, "text", 3)
    shc = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sh"),
        F.countDistinct("s").cast("long").alias("n_dist"),
    )
    return (
        per.join(shc, "doc_id", "left")
        .select(
            "doc_id",
            "n_toks",
            (F.col("max_tok").cast("double") / F.col("n_toks")).alias(
                "top_tok_frac"
            ),
            F.coalesce(
                F.lit(1.0) - F.col("n_dist").cast("double") / F.col("n_sh"),
                F.lit(0.0),
            ).alias("dup3_frac"),
        )
    )
