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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def surrogate_ids(
    df: DataFrame, order_by: list[str], id_col: str, start: int = 1
) -> DataFrame:
    ranged = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
    part = ranged.withColumn("__pid", F.spark_partition_id())

    w_local = Window.partitionBy("__pid").orderBy(*order_by)
    local = part.withColumn("__rn", F.row_number().over(w_local))

    sizes = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )

    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_col,
            (F.col("__off") + F.col("__rn") + F.lit(start - 1)).cast("long"),
        )
        .drop("__pid", "__rn", "__off")
    )
