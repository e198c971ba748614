"""Dense deterministic surrogate ids at any scale.

``row_number() OVER (ORDER BY key)`` is semantically what a surrogate
key wants (dense, deterministic, key-ordered), but Spark executes an
unpartitioned window as a single-partition sort — the whole table
through one task. This operator produces the IDENTICAL ids with a
distributed plan:

1. range-repartition + in-partition sort on the key (the ordinary
   distributed sort — each partition holds a contiguous key range);
2. per-partition row_number (no cross-partition data movement);
3. global id = partition offset + local row number, where offsets are
   a running sum over the per-partition COUNTS — a frame of
   #partitions rows, so its single-partition window costs nothing.

Range boundaries come from sampling and are not themselves
deterministic, but the final id is the key's global rank, which does
not depend on where the boundaries fell — so the output is exactly
``row_number() OVER (ORDER BY key)`` (the registered query's DuckDB
oracle states it as such). ``order_by`` must be a total order for
full determinism (append a unique column, as with
``dedup_deterministic``).

This replaces the reference's sink-generated SERIAL ids
(``/root/reference/schema_database_pgsql.sql`` sequences) for
sink-independent runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: list[Column | str],
    id_col: str,
    start: int = 1,
) -> DataFrame:
    """Distributed ``row_number() OVER (ORDER BY *order_by)``.

    ``order_by`` may contain sort-order expressions (``F.desc(...)``,
    ``col.asc_nulls_first()``); the range partitioner and the local
    window see the same sort orders, so partition k holds exactly the
    rows ranked between partitions k-1 and k+1. ``order_by`` must be a
    total order for a deterministic result.
    """
    ranged = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
    part = ranged.withColumn("__pid", F.spark_partition_id())

    w_local = Window.partitionBy("__pid").orderBy(*order_by)
    local = part.withColumn("__rn", F.row_number().over(w_local))

    sizes = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    # exclusive prefix sum over the #partitions-row sizes frame via a
    # triangular self-join (P^2 pairs, P = partition count) — no
    # unpartitioned window anywhere in the plan
    prior = sizes.select(
        F.col("__pid").alias("__pid_lt"), F.col("__n").alias("__n_lt")
    )
    offsets = (
        sizes.join(F.broadcast(prior), F.col("__pid_lt") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__n_lt"), F.lit(0)).alias("__off"))
    )

    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_col,
            (F.col("__off") + F.col("__rn") + F.lit(start - 1)).cast("long"),
        )
        .drop("__pid", "__rn", "__off")
    )


def surrogate_ids(
    df: DataFrame, order_by: list[str], id_col: str, start: int = 1
) -> DataFrame:
    return global_row_number(df, list(order_by), id_col, start)


def global_ntile(
    df: DataFrame, order_by: list[Column | str], n_tiles: int, tile_col: str
) -> DataFrame:
    """Distributed ``NTILE(n) OVER (ORDER BY *order_by)``.

    Exact NTILE semantics: with cnt = q*n + r rows, the FIRST r tiles
    get q+1 rows and the rest get q — ``((rank-1)*n) div cnt + 1``
    would spread the larger tiles evenly instead, which disagrees with
    SQL NTILE whenever cnt % n != 0.
    """
    ranked = global_row_number(df, order_by, "__grank")
    total = ranked.agg(F.count(F.lit(1)).alias("__cnt"))
    # `div` = exact integer division (double `/` rounds past 2^53 rows)
    tile = F.expr(
        f"""CASE
          WHEN __grank - 1 < (__cnt % {n_tiles}) * (__cnt div {n_tiles} + 1)
          THEN (__grank - 1) div (__cnt div {n_tiles} + 1) + 1
          ELSE (__cnt % {n_tiles})
               + ((__grank - 1) - (__cnt % {n_tiles}) * (__cnt div {n_tiles} + 1))
                 div (__cnt div {n_tiles}) + 1
        END"""
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(tile_col, tile.cast("int"))
        .drop("__grank", "__cnt")
    )
