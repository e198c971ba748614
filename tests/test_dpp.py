"""Dynamic partition pruning: the physical plan must carry a runtime
``dynamicpruningexpression`` on the partitioned fact scan — and it
must be the ONLY pruning lever (no statically-propagated filter on
the partition column), since the dim's quarter attribute is a stored
column with no expression lineage to the join key. Result correctness
is covered by the registered DuckDB oracle (``test_queries``); this
file asserts the scan-elimination property itself, the thing that
matters at 100 TB."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from etl_xlsx_potgres_spark import registry
from etl_xlsx_potgres_spark.plans.dpp_pruning import (
    QUARTER,
    _provision,
    dpp_join,
)

registry.load_all()


def _plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dpp_expression_in_fact_scan(spark, sf_dir):
    plan = _plan_str(dpp_join(spark, sf_dir))
    pf_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert pf_lines, "fact scan lost its partitioned layout"
    assert any("dynamicpruningexpression" in ln for ln in pf_lines), (
        "no DynamicPruningExpression in the fact scan's "
        f"PartitionFilters:\n{pf_lines}"
    )
    # the pruning must be DYNAMIC-only: a 'concat'/quarter literal in
    # PartitionFilters would mean constraint propagation rewrote the
    # dim filter statically and the demonstration is vacuous
    assert not any(QUARTER in ln for ln in pf_lines), (
        f"static quarter filter leaked into PartitionFilters:\n{pf_lines}"
    )


def test_dpp_actually_prunes_partitions(spark, sf_dir):
    """Runtime proof, not just plan text: the pruned join touches 3
    month-partitions of the ~80 the fact layout has."""
    # each provision overwrites (fresh part filenames), so every
    # DataFrame is collected before the next provisioning call
    joined = dpp_join(spark, sf_dir)
    months = {r["ship_month"] for r in
              joined.select("ship_month").distinct().collect()}
    assert months == {"1996-01", "1996-02", "1996-03"}
    agg = {
        r["ship_month"]: r["line_count"]
        for r in registry.QUERIES["dpp_partition_pruned_join"](
            spark, sf_dir
        ).collect()
    }
    # a fresh read of the final layout: many partitions exist, and a
    # direct statically-pruned scan agrees with the DPP aggregate
    fact = spark.read.parquet(_provision(spark, sf_dir))
    total_months = fact.select("ship_month").distinct().count()
    assert total_months > 24, "fixture must span many month partitions"
    direct = {
        r["ship_month"]: r["cnt"]
        for r in fact.filter(F.col("ship_month").isin(list(months)))
        .groupBy("ship_month")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert agg == direct
