"""Streaming queries exposed through the driver contract: each runs a
REAL Structured Streaming query (file source -> watermarked windowed
agg -> memory sink) to completion, then returns the sink table. The
tumbling aggregation is oracle-checked — streaming and batch must
agree on a bounded input; session windows are checked against the
gap-based SQL formulation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.numeric import sql_msum
from ..registry import register
from ..streaming.events_stream import (
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
