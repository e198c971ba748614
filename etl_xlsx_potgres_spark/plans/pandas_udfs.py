"""Arrow-vectorized Python paths: scalar @pandas_udf and cogrouped
applyInPandas (pd.merge_asof) — the sanctioned slow-path escapes when
builtin expressions can't express the logic. Each is oracle-checked
(the scalar UDF) or cross-checked against the native formulation (the
cogrouped as-of, see tests), so the Python path provably agrees with
the declarative one."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


# Scalar pandas UDF: whole Arrow batches in/out (~10-100x over
# row-at-a-time UDFs). The logic is deliberately SQL-expressible so
# the oracle pins the Python path's correctness. Built lazily: the
# decorator needs an active SparkSession, which doesn't exist at
# module import time.
def _risk_score_udf():
    @F.pandas_udf("double")
    def _risk_score(acctbal: pd.Series, nationkey: pd.Series) -> pd.Series:
        base = (-acctbal).clip(lower=0.0)
        return (base * 0.01 + (nationkey % 5).astype("float64")).round(4)

    return _risk_score


@register(
    "pandas_udf_risk_score",
    oracle="""
    SELECT c_custkey,
           round(greatest(-c_acctbal, 0.0) * 0.01
                 + CAST(c_nationkey % 5 AS DOUBLE), 4) AS risk
    FROM customer
    """,
)
def pandas_udf_risk_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", _risk_score_udf()("c_acctbal", "c_nationkey").alias("risk")
    )


def asof_join_cogrouped(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """As-of join via cogrouped applyInPandas + pd.merge_asof: both
    sides are co-partitioned on user_id, each group pair merges
    locally. The alternative formulation to the union+window one in
    plans/relational.py (join_asof_purchase_click); a property test
    asserts they agree.

    Column-naming contract: Spark prunes cogroup INPUT columns by
    name against the required output schema (a column a downstream
    select drops is pruned from the child even though the Python
    function reads it). Every input column the function uses must
    therefore appear in the output schema — the clicks side is
    pre-renamed to its output names (click_id/click_ts)."""
    clicks_renamed = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )

    def merge(p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "ts", "click_id", "click_ts"]
        if len(p) == 0:
            return pd.DataFrame(columns=cols)
        p = p.sort_values("ts")
        if len(c) == 0:
            out = p.assign(
                click_id=pd.Series(dtype="float64"),
                click_ts=pd.Series(dtype="datetime64[us]"),
            )
            return out[cols]
        c = c.sort_values("click_ts")[["click_ts", "click_id"]]
        merged = pd.merge_asof(
            p, c, left_on="ts", right_on="click_ts", direction="backward"
        )
        return merged[cols]

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks_renamed.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, ts timestamp, click_id double, click_ts timestamp",
        )
    )


@register(
    "join_asof_cogrouped",
    # DuckDB's native ASOF LEFT JOIN is the exact relational twin of
    # merge_asof(direction="backward"): most recent click at-or-before
    # each purchase, NULLs when none. (No (user_id, ts) click ties in
    # the corpus, so "most recent" is unambiguous on both engines.)
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           c.click_id, c.click_ts
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE user_id % 10 = 3 AND event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT event_id AS click_id, user_id, ts AS click_ts FROM events
          WHERE user_id % 10 = 3 AND event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def join_asof_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scoped to a deterministic 10% user cohort: the cogroup ships every
    # group through a Python worker (~5ms/group — the applyInPandas cost
    # model in udaf_pandas), and the full-corpus as-of join is already
    # served by the all-JVM `join_asof_purchase_click`. This query
    # exists to exercise the cogrouped merge_asof path, which the
    # cohort does at 1/10th the bench cost.
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 3)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join_cogrouped(purchases, clicks)
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("click_id").cast("long").alias("click_id"),
        "click_ts",
    )
