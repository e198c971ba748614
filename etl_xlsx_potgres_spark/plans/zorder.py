"""Z-order (Morton) clustering — multi-dimensional data layout for
file-level skipping, the 100 TB table-layout lever Delta/Iceberg call
OPTIMIZE ZORDER BY.

A parquet scan prunes row groups by per-file column min/max footers.
Sorting by ONE column makes its footer ranges tight and every other
column's ranges full-width; interleaving the bits of two columns into
one z-value and range-sorting by that bounds BOTH columns' ranges per
file (each z-prefix is a rectangle in (a, b) space), so predicates on
either dimension skip files.

The interleave is pure integer arithmetic (shift/mask on both
engines), so the locality statistics are exactly oracle-checkable.

Self-contained in ``plans/`` (not ``operators/``) deliberately: the
green-stamp ledger hashes the shared operator packages as one core,
and this round is additive-only — see GREEN_STAMPS.json.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

Z_BITS = 11  # per-dimension bits: a in [0, 2048), b in [0, 2048)
# bucket = z >> 14 keeps an 8-bit prefix (4 bits per dim): a 16x16
# grid of rectangles, so per-bucket spans are provably <= 1/16 of
# each dimension's width.
BUCKET_SHIFT = 14


def zvalue(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns: bit i of ``a`` lands at position 2i, bit i of
    ``b`` at 2i+1. Plain shift/mask terms — whole-stage codegen, no
    UDF."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x + y, terms)


def _zvalue_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of :func:`zvalue` (same bit placement)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame, a: Column, b: Column, n_partitions: int
) -> DataFrame:
    """Layout pass for a write: range-partition + sort by the
    interleaved z-value so every output file covers one compact
    rectangle of (a, b) space — both columns' parquet footers come out
    tight. Use before ``.write.parquet`` the way Delta's OPTIMIZE
    ZORDER BY is used."""
    z = zvalue(a, b)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


# a = minute-of-day (0..1439, fits 11 bits), b = user_id mod 2048:
# fixed, data-independent quantizations so the oracle needs no
# data-dependent scaling join.
_A_SPARK = "(hour(ts) * 60 + minute(ts))"
_A_DUCK = "(CAST(hour(ts) AS BIGINT) * 60 + CAST(minute(ts) AS BIGINT))"
_B_SPARK = "pmod(user_id, 2048)"
_B_DUCK = "(user_id % 2048)"


@register(
    "zorder_locality_stats",
    oracle=f"""
    WITH coords AS (
      SELECT {_A_DUCK} AS a, {_B_DUCK} AS b FROM events
    ),
    z AS (
      SELECT a, b, {_zvalue_sql("a", "b")} AS zval FROM coords
    )
    SELECT CAST((zval >> {BUCKET_SHIFT}) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(a) AS BIGINT) AS min_a, CAST(MAX(a) AS BIGINT) AS max_a,
           CAST(MIN(b) AS BIGINT) AS min_b, CAST(MAX(b) AS BIGINT) AS max_b,
           CAST(MAX(a) - MIN(a) AS BIGINT) AS span_a,
           CAST(MAX(b) - MIN(b) AS BIGINT) AS span_b
    FROM z
    GROUP BY bucket
    """,
)
def zorder_locality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per z-prefix-bucket locality proof: every bucket's span in BOTH
    dimensions is bounded by its rectangle (<= 1/16 of each dimension
    for the 8-bit prefix), which is exactly why a z-sorted file layout
    skips on either predicate. One map-only projection + one 256-group
    aggregate — partial aggregation keeps the shuffle constant-size."""
    ev = load_table(spark, sf_dir, "events")
    a = F.expr(_A_SPARK).cast("long")
    b = F.expr(_B_SPARK).cast("long")
    z = zvalue(F.col("a"), F.col("b"))
    return (
        ev.select(a.alias("a"), b.alias("b"))
        .select("a", "b", z.alias("zval"))
        .groupBy(
            F.shiftright("zval", BUCKET_SHIFT).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("a").cast("long").alias("min_a"),
            F.max("a").cast("long").alias("max_a"),
            F.min("b").cast("long").alias("min_b"),
            F.max("b").cast("long").alias("max_b"),
        )
        .select(
            "bucket",
            "n",
            "min_a",
            "max_a",
            "min_b",
            "max_b",
            (F.col("max_a") - F.col("min_a")).cast("long").alias("span_a"),
            (F.col("max_b") - F.col("min_b")).cast("long").alias("span_b"),
        )
    )
