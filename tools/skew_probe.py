"""Skew probe: measure the salt-sharded two-phase top-k (the
``text_inverted_index`` shape) against the naive single window on a
deliberately skewed key distribution — one hot key owning ~90% of all
rows. The naive plan funnels every hot-key row into ONE task's sort;
the salted plan bounds each task at 1/SALTS of the hot key and
re-ranks <= SALTS*K survivors.

Usage:
    python tools/skew_probe.py [--rows 4000000] [--hot-share 0.9]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_xlsx_potgres_spark.session import get_spark  # noqa: E402

K = 10
SALTS = 64


def build(spark, rows: int, hot_share: float):
    base = spark.range(rows)
    df = base.select(
        F.when(
            (F.col("id") % 1000) < int(1000 * hot_share), F.lit("hot")
        )
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 997).cast("string")))
        .alias("term"),
        F.col("id").alias("doc_id"),
        (F.lit(1) + F.col("id") % 50).alias("tf"),
    )
    # materialize so generation cost is out of both timings
    df.write.mode("overwrite").parquet("/tmp/skew_probe_tf")
    return spark.read.parquet("/tmp/skew_probe_tf")


def naive_topk(tf):
    w = Window.partitionBy("term").orderBy(F.desc("tf"), "doc_id")
    return (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
    )


def salted_topk(tf):
    salted = tf.withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(SALTS)))
    w_local = Window.partitionBy("term", "salt").orderBy(F.desc("tf"), "doc_id")
    surv = (
        salted.withColumn("lrn", F.row_number().over(w_local))
        .filter(F.col("lrn") <= K)
        .drop("salt", "lrn")
    )
    w_global = Window.partitionBy("term").orderBy(F.desc("tf"), "doc_id")
    return (
        surv.withColumn("rn", F.row_number().over(w_global))
        .filter(F.col("rn") <= K)
    )


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--hot-share", type=float, default=0.9)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    import statistics

    spark = get_spark(app_name="skew-probe")
    tf = build(spark, args.rows, args.hot_share)

    # equivalence first: identical result sets
    a = naive_topk(tf).select("term", "doc_id", "rn")
    b = salted_topk(tf).select("term", "doc_id", "rn")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"salted top-k diverges from naive: {diff} rows"

    naive_s, salted_s = [], []
    for _ in range(args.passes):
        naive_s.append(timed(naive_topk(tf)))
        salted_s.append(timed(salted_topk(tf)))
    report = {
        "rows": args.rows,
        "hot_share": args.hot_share,
        "naive_sec": round(statistics.median(naive_s), 3),
        "salted_sec": round(statistics.median(salted_s), 3),
        "speedup": round(
            statistics.median(naive_s) / statistics.median(salted_s), 2
        ),
        "equivalent": True,
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
