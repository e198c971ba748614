"""Exact-substring duplication candidates via content-anchored
window fingerprints — the distributed alternative to the suffix-array
pass of "Deduplicating Training Data Makes Language Models Better"
(Lee et al., 2022).

Anchor choice matters (measured lesson, see tests): a position-STRIDED
scheme (p = 1, 1+S, 1+2S, ...) is phase-fragile — copy the same run
behind a prefix whose length is not a multiple of S and the two
documents' windows sample the run at different offsets, so no
fingerprint matches even for arbitrarily long shared runs. The fix is
the winnowing idea: select window positions by CONTENT, not position.
Here anchors are word starts (p = 1 or the previous char is a space)
— any shared run that contains a word start followed by >= K chars
anchors at the SAME run offset in every document containing it,
regardless of surrounding phase. (A run with no space in it anchors
only at p=1 — the documented blind spot; text corpora are word
streams, and a full content-defined rolling-anchor variant slots into
the same plan by changing the anchor predicate.)

Plan shape (unchanged by the anchor fix):

  map:    per-character explode is PIPELINED straight into the anchor
          filter inside one codegen stage — only word-start rows
          survive to the md5 projection; nothing per-character is
          shuffled or materialized
  reduce: group by the 128-bit fingerprint; any fingerprint seen in
          >= 2 distinct documents marks a K-char run shared verbatim

At 100 TB: surviving window count is ~len/avg_word_len per document,
the shuffle key is a uniform hash (no skew by construction), and the
reduce state per key is a counter + min/max. The verify stage (byte
compare of flagged runs) joins back on doc_id for the flagged subset
only.

Reference lifecycle note: the reference engine (a pandas->Postgres
loader, ``etl_process.py:1-235``) has no corpus stage; this is
north-star surface for the driver-mandated LLM-curation pack.

Oracle: DuckDB computes the identical anchors + windows with
``generate_series`` + ``substr`` + ``md5`` — agreement is
bit-for-bit, not statistical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

WINDOW = 40  # chars per fingerprinted window


@register(
    "dedup_substring_windows",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             unhex(md5(substr(text, CAST(p AS INT), {WINDOW}))) AS hb
      FROM documents,
           LATERAL unnest(generate_series(1, length(text) - {WINDOW - 1}))
             t(p)
      WHERE length(text) >= {WINDOW}
        AND (p = 1 OR substr(text, CAST(p AS INT) - 1, 1) = ' ')
    )
    SELECT hex(hb) AS h,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM w
    GROUP BY hb
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dedup_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-start-anchored K-char fingerprints shared across >= 2
    documents. One pipelined explode+filter (no per-char shuffle) +
    one groupBy on the md5 key; the text column itself is never
    shuffled — only (doc_id, fingerprint)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= WINDOW
    )
    windows = (
        d.select(
            "doc_id",
            F.col("text"),
            F.explode(
                F.sequence(F.lit(1), F.length("text") - F.lit(WINDOW - 1))
            ).alias("p"),
        )
        .filter(
            (F.col("p") == 1)
            | (F.expr("substr(text, p - 1, 1)") == " ")
        )
        .select(
            "doc_id",
            # shuffle the 16-byte BINARY digest, not the 32-char hex
            # string: the digest IS the record at this stage, so the
            # encoding halves the dominant shuffle key (measured 20.7
            # MB -> ~13 MB at sf0.1, tools/shuffle_volume_probe.py);
            # hex() back only on the surviving duplicate rows
            F.unhex(F.md5(F.expr(f"substr(text, p, {WINDOW})"))).alias(
                "hb"
            ),
        )
    )
    return (
        windows.groupBy("hb")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            F.hex("hb").alias("h"),
            "n_docs",
            "n_occurrences",
            "min_doc",
            "max_doc",
        )
    )
