"""Bucketing: pre-shuffled storage layout so repeated joins/aggs on
the bucket key run with NO exchange — the 100 TB answer for a fact
table joined on the same key by every query. Asserts the physical
plan, not just the result."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from etl_xlsx_potgres_spark.sources import load_table


def _plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    import shutil

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    # a previous session may have left the managed-table dirs behind
    # without matching metastore entries
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )

    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    # forbid broadcast so the join would otherwise need a shuffle
    joined = lb.hint("merge").join(ob, lb.l_orderkey == ob.o_orderkey)
    plan = _plan_str(joined)
    assert "Exchange" not in plan, "bucketed join must not shuffle"

    # correctness: same result as the unbucketed join
    expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined.count() == expected

    # aggregation on the bucket key also skips the exchange
    agg_plan = _plan_str(lb.groupBy("l_orderkey").agg(F.count(F.lit(1))))
    assert "Exchange" not in agg_plan


def test_partition_pruning(spark, sf_dir, tmp_path):
    """Writing partitioned by a derived key and filtering on it must
    prune at the directory level (PartitionFilters, not a full scan)."""
    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_year")
    (
        o.withColumn("yr", F.year("o_orderdate"))
        .write.partitionBy("yr")
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("yr") == 1995)
    plan = _plan_str(back)
    assert "PartitionFilters" in plan and "yr" in plan.split("PartitionFilters")[1].split("\n")[0]
    expected = o.filter(F.year("o_orderdate") == 1995).count()
    assert back.count() == expected


def test_registered_bucketed_query_tables_join_exchange_free(spark, sf_dir):
    """The tables the REGISTERED query provisions (not just this
    file's ad-hoc ones) must support the Exchange-free merge join —
    pins the layout contract of join_bucketed_colocated itself."""
    from etl_xlsx_potgres_spark.plans.bucketed_join import _provision

    orders_t, lineitem_t = _provision(spark, sf_dir)
    ob = spark.table(orders_t)
    lb = spark.table(lineitem_t)
    joined = lb.hint("merge").join(ob, lb.l_orderkey == ob.o_orderkey)
    assert "Exchange" not in _plan_str(joined), (
        "registered bucketed tables lost the co-located layout"
    )
