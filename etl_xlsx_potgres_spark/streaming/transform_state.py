"""Arbitrary stateful streaming via ``transformWithStateInPandas``
(Spark 4's successor to ``applyInPandasWithState``): a per-user
activity profile maintained in TYPED state variables across
micro-batches.

Where the legacy operator (``streaming/stateful.py``) packs all state
into one tuple, ``transformWithState`` gives named, independently
evolving state primitives per key — here a ``ValueState`` for the
scalar counters and a ``MapState`` keyed by event type for the
per-type tallies (the map grows with DISTINCT types per user, not
with events; at 100 TB/day the state store still holds
#users x (#types + 1) entries, partitioned by user across executors,
and TTL — supported natively per state variable — bounds it in time).

The processor emits one profile row per (user, micro-batch); counts
and max-timestamps are monotone, so the bounded-replay check selects
the final state with max() per user exactly like the legacy twin's
query does.

ENVIRONMENT GATE: the transformWithState runtime speaks protobuf to
the JVM state server (``pyspark/sql/streaming/proto/StateMessage_pb2``
imports ``google.protobuf``), a dependency this module's own imports
do not need — so importing the module is safe everywhere, and
``tests/test_transform_with_state.py`` importorskips protobuf before
executing a query. Where protobuf is unavailable the legacy
``applyInPandasWithState`` twin (``streaming/stateful.py``, driver-
attested as ``streaming_stateful_profile``) covers the same operator
class end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, n_events long, n_types long, last_ts timestamp"


class UserActivityProcessor(StatefulProcessor):
    """ValueState (n_events, last_ts_us) + MapState (event_type -> n)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        # last_ts as epoch micros: state schemas are Arrow-typed and a
        # long survives the round-trip bit-exactly on every platform
        self._totals = handle.getValueState(
            "totals", "n_events long, last_ts_us long"
        )
        self._by_type = handle.getMapState(
            "by_type", "event_type string", "n long"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._totals.exists():
            n_events, last_us = self._totals.get()
        else:
            n_events, last_us = 0, None
        for pdf in rows:
            n_events += len(pdf)
            batch_us = int(pd.Timestamp(pdf["ts"].max()).value // 1000)
            last_us = batch_us if last_us is None else max(last_us, batch_us)
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._by_type.getValue((etype,))[0]
                    if self._by_type.containsKey((etype,))
                    else 0
                )
                self._by_type.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n_events, last_us))
        n_types = sum(1 for _ in self._by_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "n_types": [n_types],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    def close(self) -> None:
        pass


def user_activity_profile(events: DataFrame) -> DataFrame:
    """events stream -> per-user running profile (count, distinct
    event types, last seen), one output row per key per batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserActivityProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
