"""Deterministic numeric aggregation helpers.

Floating-point aggregation order differs between Spark's partial
aggregates and any single-node oracle, so raw ``SUM(double)`` is not
bit-reproducible — and neither is ``CAST(double AS DECIMAL)``: Spark
rounds the shortest decimal representation (HALF_UP on
``BigDecimal.valueOf``), DuckDB rounds the exact binary expansion, so
values whose shortest form sits exactly on a rounding tie (~0.7% of
TPC-H charge values) disagree by 1 ulp of the target scale.

Verified-deterministic policy (used by every money/measure aggregate
in the query library, mirrored in each oracle):

    SUM(expr)  ->  SUM(CAST(FLOOR(expr * 10^k) AS DECIMAL(38,0))) / 10^k

Per-row double arithmetic is bit-identical across engines (verified
at sf0.01: 60k products, 0 diffs); FLOOR of identical doubles is
identical; the integer sum is exact and order-independent; the final
divide maps equal inputs to equal doubles. k=4 keeps a 0.1-millicent
quantum. At 100 TB the DECIMAL(38,0) accumulator has ~24 digits of
headroom over a bigint, so no overflow at any realistic scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 4


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def fixed(c: Column | str, scale: int = SCALE) -> Column:
    """Exact integer-scaled view of a double expression."""
    return F.floor(_col(c) * (10**scale)).cast("decimal(38,0)")


def msum(c: Column | str, alias: str, scale: int = SCALE) -> Column:
    """Order-independent, oracle-reproducible sum of a double expr."""
    return (F.sum(fixed(c, scale)).cast("double") / (10**scale)).alias(alias)


def mavg(c: Column | str, alias: str, scale: int = SCALE) -> Column:
    """Deterministic average: exact scaled sum / count, as double."""
    return (F.sum(fixed(c, scale)).cast("double") / (10**scale) / F.count(F.lit(1))).alias(alias)


def sql_fixed(expr: str, scale: int = SCALE) -> str:
    return f"CAST(FLOOR(({expr})*{10**scale}) AS DECIMAL(38,0))"


def sql_msum(expr: str, alias: str | None = None, scale: int = SCALE) -> str:
    """DuckDB-oracle twin of :func:`msum`."""
    s = f"CAST(SUM({sql_fixed(expr, scale)}) AS DOUBLE)/{10**scale}"
    return f"{s} AS {alias}" if alias else s


def sql_mavg(expr: str, alias: str | None = None, scale: int = SCALE) -> str:
    """DuckDB-oracle twin of :func:`mavg`."""
    s = f"CAST(SUM({sql_fixed(expr, scale)}) AS DOUBLE)/{10**scale}/COUNT(*)"
    return f"{s} AS {alias}" if alias else s
