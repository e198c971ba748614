"""Character-class Shannon entropy — the classic cheap quality gate
for LLM corpus curation (low-entropy documents are boilerplate,
padding, or mojibake; near-uniform entropy flags random noise).

Scale-first shape: NO explode. A per-character explode multiplies a
100 TB text column into one row per character before the histogram
shuffle; instead the histogram over a FIXED alphabet (26 case-folded
ASCII letters + digit/space/other classes) is computed as a map-only
projection — per-letter occurrence counts via
``length(t) - length(replace(t, ch))``, the digit class via a regexp
count, whitespace via a chr()-literal replace chain (kept
backslash-free because Spark SQL escapes string literals and DuckDB
does not) — and the entropy is one folded arithmetic expression over
the 29 bucket columns. Zero shuffles, zero Python, whole-stage
codegen end to end; cost is O(alphabet * len) streaming character
scans per row, embarrassingly parallel.

Numeric determinism: every bucket count is an exact integer in both
engines and fully hash-verified; the entropy column is rounded
because Spark's ``log2`` (JVM ``Math.log`` ratio, not correctly
rounded) and DuckDB's (libm ``log2``) can diverge by ~1e-12 across
the 29-term sum — no rounding precision is bit-SAFE (a value can land
inside the divergence window around any rounding boundary; the r11
sf0.1 sweep caught doc 4558 at 4.0559575±5e-13 with 6 dp), so the
precision is chosen to make a boundary hit unlikely: at 4 dp the
window-to-quantum ratio is ~1e-8 per document. The exact fix would
need a shared log2 (neither engine exposes one); the integer columns
carry the exactly-verified signal.

Reference lifecycle note: the reference engine (``etl_process.py``)
has no corpus-quality stage; this extends the driver-mandated text
analysis pack (sibling of ``text_analysis.text_quality_score``).
"""

from __future__ import annotations

import string

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

_LETTERS = tuple(string.ascii_lowercase)

# space, tab, LF, CR stripped one by one — chr() literals parse
# identically in Spark SQL and DuckDB (no backslash escapes involved)
_WS_STRIP = (
    "length(tl) - length(replace(replace(replace(replace("
    "tl, ' ', ''), chr(9), ''), chr(10), ''), chr(13), ''))"
)


def _bucket_exprs(engine: str) -> list[tuple[str, str]]:
    """(bucket_name, count expression over ``tl``) per engine; only
    the digit regex count differs (DuckDB has no regexp_count)."""
    pairs = [
        (f"c_{ch}", f"length(tl) - length(replace(tl, '{ch}', ''))")
        for ch in _LETTERS
    ]
    if engine == "spark":
        pairs.append(("c_digit", "regexp_count(tl, '[0-9]')"))
    else:
        pairs.append(("c_digit", "len(regexp_extract_all(tl, '[0-9]'))"))
    pairs.append(("c_space", _WS_STRIP))
    return pairs


def _entropy_sql(buckets: list[str], total: str) -> str:
    terms = [
        f"CASE WHEN {b} > 0 THEN -({b} * 1.0 / {total}) "
        f"* log2({b} * 1.0 / {total}) ELSE 0.0 END"
        for b in buckets
    ]
    return "round(" + " + ".join(terms) + ", 4)"


_BUCKETS = [f"c_{ch}" for ch in _LETTERS] + ["c_digit", "c_space", "c_other"]
_LETTER_SUM = " + ".join(f"c_{ch}" for ch in _LETTERS)

_ORACLE = f"""
    SELECT doc_id,
           n_chars,
           n_letters,
           c_digit AS n_digits,
           c_space AS n_spaces,
           c_other AS n_other,
           {_entropy_sql(_BUCKETS, "greatest(n_chars, 1)")} AS char_entropy
    FROM (
      SELECT *,
             {_LETTER_SUM} AS n_letters,
             n_chars - ({_LETTER_SUM}) - c_digit - c_space AS c_other
      FROM (
        SELECT doc_id, length(tl) AS n_chars,
               {", ".join(f"{e} AS {n}" for n, e in _bucket_exprs("duck"))}
        FROM (SELECT doc_id, lower(coalesce(text, '')) AS tl FROM documents)
      )
    )
"""


@register("text_char_entropy", oracle=_ORACLE)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-class entropy over the case-folded
    29-bucket alphabet. The Spark side evaluates the SAME generated
    arithmetic (selectExpr) as the oracle so term order — and hence
    the IEEE double — is identical."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", F.lower(F.coalesce(F.col("text"), F.lit(""))).alias("tl")
    )
    counted = base.selectExpr(
        "doc_id",
        "length(tl) AS n_chars",
        *[f"{e} AS {n}" for n, e in _bucket_exprs("spark")],
    )
    classed = counted.selectExpr(
        "*",
        f"{_LETTER_SUM} AS n_letters",
        f"n_chars - ({_LETTER_SUM}) - c_digit - c_space AS c_other",
    )
    return classed.selectExpr(
        "doc_id",
        "n_chars",
        "n_letters",
        "c_digit AS n_digits",
        "c_space AS n_spaces",
        "c_other AS n_other",
        f"{_entropy_sql(_BUCKETS, 'greatest(n_chars, 1)')} AS char_entropy",
    )
