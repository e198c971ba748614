"""Exponentially-weighted moving average (EWMA) per entity — the
standard smoothing/anomaly-baseline primitive (pandas ``ewm``, every
metrics stack). EWMA is a RECURSIVE fold (s_t = a*x_t + (1-a)*s_{t-1})
so it cannot be a plain window aggregate; the closed-form
sum-of-powers rewrite overflows ((1/(1-a))^rank explodes past ~1e308
for sequences in the thousands), so it is implemented as the real
fold:

  groupBy(entity) -> sort_array(collect struct(ts, id, x))
                  -> aggregate(...) sequential fold, JVM-side

The per-group state is the entity's own bounded event list (same
contract as ``udaf_price_trend_per_customer``); the fold itself is a
higher-order function inside codegen — no Python. At 100 TB the group
key (user, event_type) bounds state to one entity's history, and the
single shuffle is the groupBy.

Reference lifecycle note: the reference has no time-series stage
(``etl_process.py:1-235``); EWMA extends the driver-mandated ts pack.

Determinism: both engines fold IN THE SAME ORDER (total order by
(ts, event_id)) with the same double arithmetic, so the result is
bit-identical — no rounding needed. DuckDB's ``list_reduce`` has no
init parameter, so BOTH sides seed the accumulator with the first
element and fold the tail: ewma_0 = x_0 (the standard pandas
``adjust=False`` initialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

ALPHA = 0.5  # exactly representable: the fold is pure halving


@register(
    "ts_ewma_by_user_type",
    oracle=f"""
    SELECT user_id, event_type,
           CAST(len(xs) AS BIGINT) AS n_obs,
           CAST(xs[1] AS DOUBLE) AS first_value,
           CAST(xs[len(xs)] AS DOUBLE) AS last_value,
           CASE WHEN len(xs) = 1 THEN CAST(xs[1] AS DOUBLE)
                ELSE list_reduce(xs, (acc, x) ->
                       {ALPHA} * x + {1 - ALPHA} * acc)
           END AS ewma
    FROM (
      SELECT user_id, event_type,
             list_transform(
               list_sort(list({{'ts': ts, 'eid': event_id, 'x': value}})),
               s -> CAST(s.x AS DOUBLE)) AS xs
      FROM events
      GROUP BY user_id, event_type
    )
    """,
)
def ts_ewma_by_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    grouped = e.groupBy("user_id", "event_type").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("ts"), F.col("event_id").alias("eid"),
                    F.col("value").alias("x"),
                )
            )
        ).alias("seq")
    )
    # fold the tail over an accumulator seeded with the head — Spark's
    # aggregate() is 1-indexed via element_at, 0-based via seq[i]
    ewma = F.expr(
        f"""
        CASE WHEN size(seq) = 1 THEN CAST(element_at(seq, 1).x AS DOUBLE)
        ELSE aggregate(
               slice(seq, 2, size(seq) - 1),
               CAST(element_at(seq, 1).x AS DOUBLE),
               (acc, s) -> {ALPHA}D * s.x + {1 - ALPHA}D * acc)
        END
        """
    )
    return grouped.select(
        "user_id",
        "event_type",
        F.size("seq").cast("long").alias("n_obs"),
        F.element_at("seq", 1).x.cast("double").alias("first_value"),
        F.element_at("seq", F.size("seq")).x.cast("double").alias(
            "last_value"
        ),
        ewma.alias("ewma"),
    )
