"""Query registry backing ``__spark_entry__.py``.

Every implemented operator registers a named query (a callable
``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, a DuckDB
oracle string. The driver runs both sides at sf=0.01 and compares
row-count + schema + order-insensitive value hash.

Numeric-determinism policy (applies to BOTH sides of every pair):
floating-point aggregation order differs between Spark (partial
aggregates across partitions) and DuckDB, so raw ``SUM(double)`` is
not bit-reproducible. Wherever a float aggregate is part of a query's
output we cast inputs to exact DECIMAL first, aggregate exactly, and
cast the result back to DOUBLE — both engines then produce the same
exact decimal and hence the identical IEEE double. Averages are
expressed as decimal-sum / count for the same reason. This is also
the right call at 100 TB: money sums in double drift; decimal sums
do not.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so registration side-effects run."""
    from . import plans  # noqa: F401
