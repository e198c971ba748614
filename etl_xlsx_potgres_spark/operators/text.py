"""Text-analysis operators for training-data pipelines: tokenization,
normalization, fingerprinting, shingling, MinHash, language ID,
quality scoring.

All pure Catalyst expressions (split/transform/aggregate/regexp_*) —
no Python UDFs, so they run vectorized JVM-side and scale to 100 TB
document corpora. MinHash uses md5-of-(seed||shingle) with
*lexicographic* min: md5 hex strings compare identically in any
engine, which makes signatures portable to the DuckDB oracle (and any
other SQL system) without relying on engine hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# CJK unified ideographs range, embedded as literal characters so the
# same pattern source works in both Java regex and RE2.
CJK_RANGE = f"[{chr(0x4E00)}-{chr(0x9FFF)}]"

# Language marker stopwords for the n-gram-free heuristic language ID.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is)\b",
    "de": r"\b(der|die|und|das|ist|nicht)\b",
    "es": r"\b(el|la|de|que|los|es)\b",
    "fr": r"\b(le|les|et|des|est|une)\b",
}


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization of lowercased text; empty-safe."""
    return F.filter(F.split(F.trim(F.lower(_c(c))), r"\s+"), lambda x: x != "")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def normalize_text(c: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, strip non-alnum
    (keeping spaces), collapse runs of whitespace."""
    lowered = F.lower(_c(c))
    alnum = F.regexp_replace(lowered, r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(alnum, r"\s+", " "))


def fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Portable across engines (md5 of identical UTF-8 bytes)."""
    return F.md5(normalize_text(c))


def shingles(c: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles as an array<string>; empty when the text
    has fewer than k tokens."""
    toks = tokens(c)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signature(c: Column | str, n_hashes: int = 8, k: int = 3) -> list[Column]:
    """Portable MinHash: for seed i, min over shingles of
    md5('<i>|' || shingle) (lexicographic). Returns one column per
    hash, aliased mh0..mh{n-1}. NULL when the doc has no shingles."""
    sh = shingles(c, k)

    def seeded(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    out = []
    for i in range(n_hashes):
        out.append(F.array_min(F.transform(sh, seeded(i))).alias(f"mh{i}"))
    return out


def sql_minhash_exprs(text_expr: str, n_hashes: int = 8, k: int = 3) -> list[str]:
    """DuckDB twin of :func:`minhash_signature` (same seeds/format)."""
    toks = f"list_filter(string_split_regex(trim(lower({text_expr})), '\\s+'), x -> x <> '')"
    sh = (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(generate_series(1, len({toks}) - {k - 1}), "
        f"i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' ')) "
        f"ELSE [] END"
    )
    return [
        f"list_min(list_transform({sh}, s -> md5('{i}|' || s))) AS mh{i}"
        for i in range(n_hashes)
    ]


def simhash_bits(c: Column | str, n_bits: int = 32) -> Column:
    """SimHash over whitespace tokens, emitted as an ``n_bits``-char
    '0'/'1' string (portable across engines; callers band on
    substrings of it). Bit j is set when the majority-weighted j-th
    md5 nibble of the doc's tokens is >= 8."""
    toks = tokens(c)

    # weight +1 if nibble j of md5(token) >= 8 else -1, summed over tokens
    def nibble_weight(j: int):
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(t), j + 1, 1).isin(*"89abcdef"), F.lit(1)
        ).otherwise(F.lit(-1))

    bits = []
    for j in range(n_bits):
        contrib = F.aggregate(toks, F.lit(0), nibble_weight(j))
        bits.append(F.when(contrib > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def sql_simhash_expr(text_expr: str, n_bits: int = 32) -> str:
    """DuckDB twin of :func:`simhash_bits`."""
    toks = f"list_filter(string_split_regex(trim(lower({text_expr})), '\\s+'), x -> x <> '')"
    parts = []
    for j in range(n_bits):
        contrib = (
            f"list_sum(list_transform({toks}, t -> CASE WHEN "
            f"substring(md5(t), {j + 1}, 1) IN "
            "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END))"
        )
        parts.append(f"CASE WHEN COALESCE({contrib}, 0) > 0 THEN '1' ELSE '0' END")
    return " || ".join(parts)
