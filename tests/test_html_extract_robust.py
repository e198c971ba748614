"""The HTML synthesis XML-escapes tokens and the parser unescapes
them (ADVICE r15): a markup-bearing fixture must round-trip exactly —
parsed block text equals the RAW token text, so the DuckDB oracle's
generative formula (which never sees the markup) stays correct for
ANY fixture charset, not just the committed lowercase-ASCII one."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_xlsx_potgres_spark.plans.html_extract import (
    BLOCK_TOKENS,
    _SPARK_HTML,
    _BlockParser,
    _extract_batches,
)

# tokens that would break an unescaped synthesis: bare ampersands,
# angle brackets forming real-looking tags, and pre-escaped entities
# that must NOT be double-decoded
_MARKUP_TOKS = [
    "a&b", "<script>", "alert(1)", "</script>", "x>y",
    "&amp;", "<p>", "plain", "q&a;", "five<6",
    "tail1", "tail2", "tail3",
]


def _expected_blocks(toks: list[str]) -> list[tuple[str, int]]:
    """(text, link_chars) per block straight from the generative
    rules over RAW tokens — the same formula the DuckDB oracle states."""
    out = []
    n_blocks = (len(toks) + BLOCK_TOKENS - 1) // BLOCK_TOKENS
    for i in range(1, n_blocks + 1):
        chunk = toks[(i - 1) * BLOCK_TOKENS: i * BLOCK_TOKENS]
        text = " ".join(chunk)
        if i % 3 == 1:
            link = len(text)
        elif i % 5 == 2:
            link = len(chunk[0])
        else:
            link = 0
        out.append((text, link))
    return out


def test_markup_tokens_round_trip_through_synthesis_and_parse(spark):
    df = spark.createDataFrame(
        [(1, _MARKUP_TOKS)], "doc_id long, toks array<string>"
    )
    html = df.select(F.expr(_SPARK_HTML).alias("html")).first()["html"]
    # the synthesized document must not leak raw markup from tokens:
    # the only <script> is the synthesis's own header
    assert html.count("<script>") == 1
    p = _BlockParser()
    p.feed(html)
    p.close()
    assert p.blocks == _expected_blocks(_MARKUP_TOKS)


def test_extractor_output_matches_generative_formula_on_markup(spark):
    df = spark.createDataFrame(
        [(7, _MARKUP_TOKS)], "doc_id long, toks array<string>"
    )
    out = (
        df.select("doc_id", F.expr(_SPARK_HTML).alias("html"))
        .mapInPandas(
            _extract_batches,
            "doc_id long, n_blocks long, n_kept long, text_chars long,"
            " link_chars long, extracted_text string, extracted_chars long",
        )
        .first()
    )
    blocks = _expected_blocks(_MARKUP_TOKS)
    kept = [t for t, a in blocks if 2 * a <= len(t)]
    assert out["n_blocks"] == len(blocks)
    assert out["n_kept"] == len(kept)
    assert out["text_chars"] == sum(len(t) for t, _ in blocks)
    assert out["link_chars"] == sum(a for _, a in blocks)
    assert out["extracted_text"] == " ".join(kept)
