"""Exact-substring duplication candidates via rolling fixed-width
window fingerprints — the distributed alternative to the suffix-array
pass of "Deduplicating Training Data Makes Language Models Better"
(Lee et al., 2022). A suffix array needs global order over the whole
corpus (quadratic-ish to build distributed); the window-fingerprint
formulation needs ONE uniform shuffle:

  map:    each document emits md5(substr(text, p, K)) for
          p = 1, 1+S, 1+2S, ... (K = window, S = stride) — pure
          projection + explode, no Python, no state
  reduce: group by the 128-bit fingerprint; any fingerprint seen in
          >= 2 distinct documents marks a K-char run shared verbatim
          across documents (stride S < K guarantees every shared run
          of length >= K + S - 1 is caught by at least one aligned
          window on each side)

At 100 TB: window count is len/S per document (~5% row expansion at
S=20 on the emitted key column only — the md5 key is constant-width
regardless of text size), the shuffle key is a uniform hash (no skew
by construction), and the reduce state per key is a counter + min/max
— this is the canonical map-side-light candidate stage; the verify
stage (byte compare of flagged runs) joins back on doc_id only for
the tiny flagged subset.

Reference lifecycle note: the reference engine (a pandas->Postgres
loader, ``etl_process.py:1-235``) has no corpus stage; this is
north-star surface for the driver-mandated LLM-curation pack.

Oracle: DuckDB computes the identical windows with
``generate_series`` + ``substr`` + ``md5`` — both engines hash the
UTF-8 bytes of the same character-addressed substring, so agreement
is bit-for-bit, not statistical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

WINDOW = 40  # chars per fingerprinted window
STRIDE = 20  # step between window starts (< WINDOW: overlap-covering)


@register(
    "dedup_substring_windows",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, CAST(p AS BIGINT) AS p,
             md5(substr(text, CAST(p AS INT), {WINDOW})) AS h
      FROM documents,
           LATERAL unnest(generate_series(1, length(text) - {WINDOW - 1},
                                          {STRIDE})) t(p)
      WHERE length(text) >= {WINDOW}
    )
    SELECT h,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM w
    GROUP BY h
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dedup_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprints shared verbatim across >= 2 documents. One explode
    (sequence of window starts) + one groupBy on the md5 key; the text
    column itself is never shuffled — only (doc_id, fingerprint)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= WINDOW
    )
    windows = d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1),
                F.length("text") - F.lit(WINDOW - 1),
                F.lit(STRIDE),
            )
        ).alias("p"),
        F.col("text"),
    ).select(
        "doc_id",
        F.md5(F.expr(f"substr(text, p, {WINDOW})")).alias("h"),
    )
    return (
        windows.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
