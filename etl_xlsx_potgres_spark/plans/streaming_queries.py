"""Streaming queries exposed through the driver contract: each runs a
REAL Structured Streaming query (file source -> watermarked windowed
agg -> memory sink) to completion, then returns the sink table. The
tumbling aggregation is oracle-checked — streaming and batch must
agree on a bounded input; session windows are checked against the
gap-based SQL formulation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..functions.numeric import sql_msum
from ..registry import register
from ..streaming.events_stream import (
    dedup_stream,
    interval_join,
    read_events_stream,
    run_streaming_query,
    session_windows,
    tumbling_counts,
)


@register(
    "streaming_tumbling_agg",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           COUNT(*) AS n, {sql_msum("value", "total_value")}
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    return run_streaming_query(
        tumbling_counts(events), "stream_tumbling_sink", output_mode="complete"
    )


@register(
    "streaming_session_windows",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events, {sql_msum("value", "session_value")}
    FROM sess GROUP BY user_id, sid
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    return run_streaming_query(
        session_windows(events), "stream_session_sink", output_mode="complete"
    )


# Streaming exact dedup under driver attestation. The dedup key
# includes the hour bucket so the semantics are EXACTLY oracle-able:
# duplicates of one key differ in ts by < 1 h, well inside the 2 h
# watermark delay, where dropDuplicatesWithinWatermark GUARANTEES the
# drop (duplicates farther apart than the delay are only best-effort —
# keying by bucket removes that ambiguity, which is also the honest
# production posture: an unbounded-horizon exact dedup does not exist
# on an infinite stream). State stays bounded: one entry per key
# within the watermark horizon.
@register(
    "streaming_dedup_events",
    oracle="""
    SELECT event_type, COUNT(*) AS n_unique
    FROM (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts)
          FROM events)
    GROUP BY event_type
    """,
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir).withColumn(
        "bucket", F.date_trunc("hour", "ts")
    )
    deduped = dedup_stream(
        ev, ["user_id", "event_type", "bucket"], watermark="2 hours"
    )
    sink = run_streaming_query(
        deduped, "stream_dedup_sink", output_mode="append"
    )
    return sink.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique"))


# Stream-stream interval join (purchase <- same-user clicks at most
# 1 h before): on a bounded replay the inner join must agree row-for-
# row with the batch time-range join — the differential check that the
# watermark + two-sided time bound doesn't drop or duplicate matches.
@register(
    "streaming_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts, c.event_id AS click_id, c.ts AS click_ts
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    clicks = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    )
    joined = interval_join(purchases, clicks, max_delay="1 hour", watermark="2 hours")
    return run_streaming_query(joined, "stream_ivjoin_sink", output_mode="append")


# Custom stateful operator (applyInPandasWithState) under driver
# attestation: the per-user running profile's count and last-seen ts
# are exact integers/timestamps, so the FINAL state per user must
# equal the batch aggregate. The update-mode sink may carry one row
# per (user, micro-batch); running counts are monotone, so max() per
# user selects the final state regardless of how the bounded replay
# was batched. (total_value is deliberately not compared: a float
# accumulator is not bit-reproducible across engines — the exact-sum
# posture for money lives in the msum-based queries.)
@register(
    "streaming_stateful_profile",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, MAX(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def streaming_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import running_user_profile

    ev = read_events_stream(spark, sf_dir)
    sink = run_streaming_query(
        running_user_profile(ev), "stream_stateful_sink", output_mode="update"
    )
    return sink.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("last_ts").alias("last_ts")
    )


# Landing-directory ingest (the reference's uploads-folder intake,
# importador.py:7-28, as a Structured Streaming file source) under
# driver attestation: a deterministic 3-file CSV drop — 588 clean
# rows + 12 schema-violating rows — streams through the PERMISSIVE
# quarantine channel into a memory sink, and the one-row summary
# (clean/quarantine counts + value checksums) is re-derived by the
# oracle from generate_series. Exactly-once-per-file checkpoint
# semantics are covered separately in tests/test_streaming.py; this
# query attests the ingest PARSE semantics differentially.
_LANDING_N = 600
_LANDING_BAD_MOD = 50


@register(
    "streaming_landing_ingest",
    oracle=f"""
    WITH src AS (SELECT i FROM generate_series(0, {_LANDING_N - 1}) t(i))
    SELECT
      CAST(SUM(CASE WHEN i % {_LANDING_BAD_MOD} <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_clean,
      CAST(SUM(CASE WHEN i % {_LANDING_BAD_MOD} <> 0 THEN i END) AS BIGINT)
        AS sum_item_id,
      CAST(SUM(CASE WHEN i % {_LANDING_BAD_MOD} <> 0 THEN (i * 3) % 100 END) AS BIGINT)
        AS sum_amount,
      CAST(COUNT(DISTINCT CASE WHEN i % {_LANDING_BAD_MOD} <> 0 THEN i % 7 END) AS BIGINT)
        AS n_labels,
      CAST(SUM(CASE WHEN i % {_LANDING_BAD_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_quarantined,
      CAST(SUM(CASE WHEN i % {_LANDING_BAD_MOD} = 0 THEN
        length('bad-' || CAST(i AS VARCHAR) || ',oops,NOT_A_NUMBER') END) AS BIGINT)
        AS quarantine_bytes
    FROM src
    """,
)
def streaming_landing_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..sources.files import CORRUPT_COL
    from ..streaming.landing import stream_landing_dir

    work = tempfile.mkdtemp(prefix="spark_graft_landing_")
    landing = os.path.join(work, "uploads")
    os.makedirs(landing)
    buckets: dict[int, list[str]] = {f: ["item_id,label,amount"] for f in range(3)}
    for i in range(_LANDING_N):
        if i % _LANDING_BAD_MOD == 0:
            line = f"bad-{i},oops,NOT_A_NUMBER"  # item_id/amount fail the cast
        else:
            line = f"{i},item_{i % 7},{(i * 3) % 100}"
        buckets[i % 3].append(line)
    for f, lines in buckets.items():
        with open(os.path.join(landing, f"drop_{f}.csv"), "w") as fh:
            fh.write("\n".join(lines) + "\n")

    schema = T.StructType(
        [
            T.StructField("item_id", T.IntegerType()),
            T.StructField("label", T.StringType()),
            T.StructField("amount", T.IntegerType()),
        ]
    )
    name = "landing_ingest_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    stream = stream_landing_dir(spark, landing, schema, fmt="csv")
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink holds the parsed rows; the drop dir can go
    shutil.rmtree(work, ignore_errors=True)

    tbl = spark.table(name)
    is_clean = F.col(CORRUPT_COL).isNull()
    return tbl.agg(
        F.sum(is_clean.cast("long")).alias("n_clean"),
        F.sum(F.when(is_clean, F.col("item_id"))).cast("long").alias("sum_item_id"),
        F.sum(F.when(is_clean, F.col("amount"))).cast("long").alias("sum_amount"),
        F.countDistinct(F.when(is_clean, F.col("label"))).alias("n_labels"),
        F.sum((~is_clean).cast("long")).alias("n_quarantined"),
        F.sum(F.when(~is_clean, F.length(CORRUPT_COL)))
        .cast("long")
        .alias("quarantine_bytes"),
    )
