"""EWMA skew probe: measure the ``ts_ewma_by_user_type`` fold shape
(groupBy(user, type) -> sort_array(collect_list(struct)) -> aggregate
fold) under entity skew — one hot (user, event_type) group owning
``hot_mult`` x the median group's events.

The fold is inherently sequential per group (EWMA is an ordered
recurrence), so the skew question is not shuffle balance but GROUP
SIZE: the hot group's whole event sequence is materialized as one
in-task array and folded by one task. This probe measures the wall
degradation as that group grows, and prints the hot-group size at
which the shape is still healthy.

Usage:
    python tools/ewma_skew_probe.py [--users 2000] [--median-events 50]
        [--hot-mult 100] [--also-mult 1000,10000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_xlsx_potgres_spark.session import get_spark  # noqa: E402

ALPHA = 0.5


def build(spark, users: int, median_events: int, hot_mult: int, path: str):
    """Uniform: `users` entities x `median_events` rows in one
    event_type each. Skewed variant adds ONE user whose single group
    holds hot_mult x median_events rows."""
    base = spark.range(users * median_events).select(
        (F.col("id") % users).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1000)) / 10.0).alias("value"),
    )
    hot = spark.range(hot_mult * median_events).select(
        F.lit(10_000_000).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") + 1_000_000_000).alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1000)) / 10.0).alias("value"),
    )
    base.write.mode("overwrite").parquet(os.path.join(path, "uniform"))
    base.unionAll(hot).write.mode("overwrite").parquet(os.path.join(path, "skewed"))


def ewma_shape(df):
    """The exact plans/timeseries_extra.py shape (collect_list +
    sort_array + sequential aggregate fold)."""
    grouped = df.groupBy("user_id", "event_type").agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("ts"), F.col("event_id").alias("eid"), F.col("value").alias("x"))
            )
        ).alias("seq")
    )
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
        "user_id", "event_type", F.size("seq").alias("n_obs"), ewma.alias("ewma")
    )


def time_run(spark, path: str, n: int = 3) -> float:
    df = spark.read.parquet(path)
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        ewma_shape(df).write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return round(walls[len(walls) // 2], 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--median-events", type=int, default=50)
    ap.add_argument("--hot-mult", type=int, default=100)
    ap.add_argument("--also-mult", default="")
    ap.add_argument("--out", default="/tmp/ewma_skew_probe")
    args = ap.parse_args()

    spark = get_spark(app_name="ewma_skew_probe")
    results = {}
    mults = [args.hot_mult] + [
        int(m) for m in args.also_mult.split(",") if m.strip()
    ]
    for mult in mults:
        path = os.path.join(args.out, f"mult{mult}")
        build(spark, args.users, args.median_events, mult, path)
        uni = time_run(spark, os.path.join(path, "uniform"))
        skew = time_run(spark, os.path.join(path, "skewed"))
        results[f"hot_{mult}x"] = {
            "median_group_rows": args.median_events,
            "hot_group_rows": mult * args.median_events,
            "uniform_rows": args.users * args.median_events,
            "wall_uniform_sec": uni,
            "wall_skewed_sec": skew,
            "skew_ratio": round(skew / uni, 2) if uni else None,
        }
        print(json.dumps({f"hot_{mult}x": results[f"hot_{mult}x"]}))
    print(json.dumps({"ewma_skew_probe": results}))


if __name__ == "__main__":
    main()
