"""PII detection over the text corpus — the scan stage of
training-data privacy compliance (the inverse of ``pii_scrub``'s
column-wise anonymization: here the identifiers hide INSIDE free
text).  Every production LLM pipeline runs exactly this pass (e.g.
the BigScience/ROOTS and FineWeb curation stacks): regex detectors
for emails, phone numbers, IP addresses, and national-ID-shaped
strings, with per-document counts for the compliance rollup and a
redacted rendering for downstream training.

PII synthesis: the fixture text carries no PII, so deterministic
identifiers are appended as a pure function of doc_id (email on
``% 4``, phone on ``% 5``, IPv4 on ``% 7``, SSN-shaped on ``% 11`` —
overlapping residues give multi-PII documents, co-prime gaps leave
~half the corpus clean, so every detector and the clean path are
non-vacuous at sf0.01).

Regex parity (the ``pii_scrub`` discipline): DuckDB is RE2, Spark is
Java regex — the detectors use only the shared dialect (character
classes, bounded repetition; no lookahead, no backreferences).
Counts use ``regexp_extract_all`` (Spark needs explicit group 0 — its
default group is 1; DuckDB defaults to 0), and redaction uses
``regexp_replace`` with DuckDB's explicit ``'g'`` flag (DuckDB
replaces only the FIRST match by default; Spark always replaces all).

Plan shape: ENTIRELY map-only — synthesis, four detectors, and the
redaction chain are per-row projections; zero Exchanges at any corpus
size, whole-stage codegen end to end, column pruning reaches the
scan.  At 100 TB this is one streaming pass, embarrassingly parallel.

Reference lifecycle note: the reference normalizes CPF/CNPJ and phone
columns in the clear (etl_process.py:137-160) and never scans free
text; this is the corpus-side compliance stage the driver's LLM
pipeline mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

RE_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
RE_PHONE = "\\(\\d{3}\\) \\d{3}-\\d{4}"
RE_IPV4 = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
RE_SSN = "\\d{3}-\\d{2}-\\d{4}"

_SPARK_PII_TEXT = (
    "text"
    " || CASE WHEN doc_id % 4 = 0 THEN ' reach me at user'"
    "      || CAST(doc_id AS STRING) || '@mail-host.org' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' call (555) 123-'"
    "      || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' server 192.168.'"
    "      || CAST(doc_id % 256 AS STRING) || '.'"
    "      || CAST((doc_id DIV 3) % 256 AS STRING) ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' id 903-21-'"
    "      || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ELSE '' END"
)
_DUCK_PII_TEXT = _SPARK_PII_TEXT.replace("doc_id DIV 3", "doc_id // 3").replace(
    "AS STRING", "AS VARCHAR"
)

# redaction order matters (emails contain dots an IP pattern could
# clip): most-specific first, identically on both engines
_REDACT_ORDER = (
    (RE_EMAIL, "<EMAIL>"),
    (RE_PHONE, "<PHONE>"),
    (RE_SSN, "<SSN>"),
    (RE_IPV4, "<IP>"),
)


@register(
    "pii_detect_documents",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_PII_TEXT} AS pii_text FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(pii_text, '{RE_EMAIL}'))
                AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(pii_text, '{RE_PHONE}'))
                AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(pii_text, '{RE_IPV4}'))
                AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(pii_text, '{RE_SSN}'))
                AS BIGINT) AS n_ssns,
           len(regexp_extract_all(pii_text, '{RE_EMAIL}'))
             + len(regexp_extract_all(pii_text, '{RE_PHONE}'))
             + len(regexp_extract_all(pii_text, '{RE_IPV4}'))
             + len(regexp_extract_all(pii_text, '{RE_SSN}')) > 0 AS has_pii,
           md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             pii_text,
             '{RE_EMAIL}', '<EMAIL>', 'g'),
             '{RE_PHONE}', '<PHONE>', 'g'),
             '{RE_SSN}', '<SSN>', 'g'),
             '{RE_IPV4}', '<IP>', 'g')) AS redacted_fp
    FROM t
    """,
)
def pii_detect_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.expr(_SPARK_PII_TEXT).alias("pii_text"))

    def n(regex: str):
        return F.size(
            F.regexp_extract_all("pii_text", F.lit(regex), F.lit(0))
        ).cast("long")

    redacted = F.col("pii_text")
    for regex, tag in _REDACT_ORDER:
        redacted = F.regexp_replace(redacted, regex, tag)

    total = n(RE_EMAIL) + n(RE_PHONE) + n(RE_IPV4) + n(RE_SSN)
    return t.select(
        "doc_id",
        n(RE_EMAIL).alias("n_emails"),
        n(RE_PHONE).alias("n_phones"),
        n(RE_IPV4).alias("n_ips"),
        n(RE_SSN).alias("n_ssns"),
        (total > 0).alias("has_pii"),
        F.md5(redacted).alias("redacted_fp"),
    )
