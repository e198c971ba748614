"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; explicit salting remains the tool when a single group key is
hot in an *aggregation* (AQE cannot split a hash-aggregate group) or
when a skewed shuffle join needs deterministic balancing.

Salts are deterministic (hash of a high-cardinality column, not
rand()) so runs are reproducible and retried tasks stay consistent —
at scale a rand() salt breaks speculative execution and recomputation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value: Column,
    alias: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage sum: stage 1 aggregates (keys, salt) — spreading a
    hot key over n_salts reducers — stage 2 merges the partials per
    key. ``value`` must be an exact (decimal/integer) expression so
    the two-stage regrouping cannot change the result."""
    salt = F.pmod(F.hash(F.col(salt_from)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(*keys, salt, value.alias("_v"))
        .groupBy(*keys, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(alias))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe shuffle join: the fact side gets a deterministic salt,
    the dim side is replicated n_salts times, and the join runs on
    (key, salt) so one hot key spreads over n_salts partitions."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_rep = dim.select("*", salts)
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_from)), F.lit(n_salts))
    )
    return fact_salted.join(dim_rep, [key, "_salt"]).drop("_salt")
