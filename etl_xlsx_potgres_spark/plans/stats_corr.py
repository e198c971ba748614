"""Exact-decimal Pearson correlation matrix — the data-profiling
primitive behind feature selection and drift detection. Spark's
built-in ``corr`` is a running double aggregate whose result depends
on partial-aggregation order (non-reproducible across partitionings
and vs any single-node engine), so the matrix is computed from the
five exact fixed-point sufficient statistics instead:

    corr(x,y) = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2))

Per-row products are double arithmetic (bit-identical across
engines), floor-scaled to DECIMAL(38,0) (the repo-wide msum policy),
summed exactly, and the closed form is evaluated in the same textual
order on both sides; sqrt is IEEE correctly-rounded, so the doubles
agree bit-for-bit — the matrix is partition-invariant by
construction (the property ``test_partition_invariance`` asserts).

Reference lifecycle note: the reference computes no statistics
(``etl_process.py:1-235``); this extends the profiling/audit pack.

Scale: ONE aggregate over lineitem producing a constant-size (1-row)
statistics frame; the matrix arithmetic happens on that single row.
No second pass, no per-pair scans — adding columns grows the
projection width, never the pass count.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources import load_table

_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
_SCALE = 4


def _sum_exprs() -> list[str]:
    """Shared Spark/DuckDB SQL: exact scaled sums of each column and
    each pairwise/self product (per-row double product first, then
    floor-scale — identical in both engines)."""
    exprs = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in _COLS:
        exprs.append(
            f"CAST(SUM(CAST(FLOOR({c}*{10**_SCALE}) AS DECIMAL(38,0)))"
            f" AS DOUBLE)/{10**_SCALE} AS s_{c}"
        )
    for a, b in combinations(_COLS, 2):
        exprs.append(
            f"CAST(SUM(CAST(FLOOR(({a}*{b})*{10**_SCALE}) AS DECIMAL(38,0)))"
            f" AS DOUBLE)/{10**_SCALE} AS s_{a}_{b}"
        )
    for c in _COLS:
        exprs.append(
            f"CAST(SUM(CAST(FLOOR(({c}*{c})*{10**_SCALE}) AS DECIMAL(38,0)))"
            f" AS DOUBLE)/{10**_SCALE} AS s_{c}_{c}"
        )
    return exprs


def _corr_exprs() -> list[str]:
    exprs = []
    for a, b in combinations(_COLS, 2):
        num = f"(n * s_{a}_{b} - s_{a} * s_{b})"
        da = f"(n * s_{a}_{a} - s_{a} * s_{a})"
        db = f"(n * s_{b}_{b} - s_{b} * s_{b})"
        exprs.append(f"{num} / sqrt({da} * {db}) AS corr_{a}_{b}")
    return exprs


@register(
    "stats_correlation_matrix",
    oracle=f"""
    SELECT CAST(n AS BIGINT) AS n_rows,
           {", ".join(_corr_exprs())}
    FROM (SELECT {", ".join(_sum_exprs())} FROM lineitem)
    """,
)
def stats_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    # one aggregate pass -> 1-row exact sufficient statistics, then the
    # closed form over that single row (same generated SQL as the oracle)
    stats = li.agg(*[F.expr(e) for e in _sum_exprs()])
    return stats.selectExpr("CAST(n AS BIGINT) AS n_rows", *_corr_exprs())
