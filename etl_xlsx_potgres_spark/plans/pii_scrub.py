"""PII scrubbing / anonymization pass — the compliance stage of a
production pipeline (and of LLM training-data curation: direct
identifiers must not reach the training corpus).

The reference's cleaning stage normalizes CPF/CNPJ and phone
identifiers but keeps them in the clear (``etl_process.py:137-160``);
this operator applies the three standard anonymization moves to the
customer dim's identifying fields:

- **pseudonymization** — ``name_hash`` = md5(c_name): joinable across
  tables and runs (the same entity maps to the same token, FK
  analytics still work) without storing the identifier;
- **suppression** — ``name_masked``: the customer NUMBER embedded in
  ``c_name`` ("Customer#000000042") digit-masked except the last
  ``_KEEP`` (the call-center display convention). RE2 (DuckDB) has
  no lookahead, so the mask is split-at-length-minus-KEEP +
  digit-replace — portable across both engines;
- **generalization** — ``acctbal_bucket``: balances coarsened to
  100-unit buckets, the k-anonymity-style precision reduction that
  keeps distributional analytics honest while dropping the
  quasi-identifier's precision.

``n_digits_masked`` is the per-row audit count a compliance report
aggregates.

Map-only: a pure projection, no shuffle, column pruning reaches the
scan. At 100 TB this is exactly the shape you want — the scrub
streams through every partition independently and composes with any
downstream op. All outputs are deterministic (md5, structural string
ops, exact integer bucketing), so the oracle is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

_KEEP = 4    # trailing digits left visible
_BUCKET = 100  # acctbal generalization width


@register(
    "pii_scrub_customers",
    oracle=f"""
    SELECT c_custkey,
           md5(c_name) AS name_hash,
           regexp_replace(
             substring(c_name, 1, length(c_name) - {_KEEP}),
             '[0-9]', 'X', 'g')
             || substring(c_name, length(c_name) - {_KEEP - 1}, {_KEEP})
             AS name_masked,
           CAST(length(regexp_replace(
             substring(c_name, 1, length(c_name) - {_KEEP}),
             '[^0-9]', '', 'g')) AS BIGINT) AS n_digits_masked,
           CAST(floor(c_acctbal / {_BUCKET}) AS BIGINT) * {_BUCKET}
             AS acctbal_bucket,
           c_nationkey, c_mktsegment
    FROM customer
    """,
)
def pii_scrub_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    head = F.expr(f"substring(c_name, 1, length(c_name) - {_KEEP})")
    tail = F.expr(
        f"substring(c_name, length(c_name) - {_KEEP - 1}, {_KEEP})"
    )
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_hash"),
        F.concat(
            F.regexp_replace(head, "[0-9]", "X"), tail
        ).alias("name_masked"),
        F.length(F.regexp_replace(head, "[^0-9]", ""))
        .cast("long")
        .alias("n_digits_masked"),
        (
            F.floor(F.col("c_acctbal") / _BUCKET).cast("long") * _BUCKET
        ).alias("acctbal_bucket"),
        "c_nationkey",
        "c_mktsegment",
    )
