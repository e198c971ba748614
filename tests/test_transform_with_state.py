"""``transformWithStateInPandas`` (Spark 4 arbitrary stateful
streaming) end-to-end: bounded replay of the events table through the
per-user activity processor must reproduce the batch aggregate
exactly — counts, distinct event types, last-seen timestamp.

The operator's Python runtime speaks protobuf to the JVM state
server; where ``google.protobuf`` is not installed the whole module
skips (the legacy ``applyInPandasWithState`` twin is driver-attested
as ``streaming_stateful_profile`` and runs everywhere). Importing
``streaming/transform_state.py`` itself needs no protobuf — asserted
below even when the execution tests skip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_module_imports_without_protobuf():
    from etl_xlsx_potgres_spark.streaming.transform_state import (
        user_activity_profile,
    )

    assert callable(user_activity_profile)


@pytest.fixture(scope="module")
def protobuf():
    return pytest.importorskip("google.protobuf")


def test_bounded_replay_matches_batch_aggregate(spark, protobuf):
    from etl_xlsx_potgres_spark.streaming.events_stream import (
        read_events_stream,
        run_streaming_query,
    )
    from etl_xlsx_potgres_spark.streaming.transform_state import (
        user_activity_profile,
    )

    ev = read_events_stream(spark, SF_DIR)
    sink = run_streaming_query(
        user_activity_profile(ev), "tws_test_sink", output_mode="update"
    )
    got = {
        r["user_id"]: (r["n_events"], r["n_types"], r["last_ts"])
        for r in sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_types").alias("n_types"),
            F.max("last_ts").alias("last_ts"),
        )
        .collect()
    }
    from etl_xlsx_potgres_spark.sources import load_table

    want = {
        r["user_id"]: (r["n_events"], r["n_types"], r["last_ts"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert got == want
