"""The sentinel-drain mechanism in ``plans/streaming_outer_join.py``
is load-bearing — this test proves it by running the same bounded
left-outer interval join WITH and WITHOUT the far-future sentinel
batches on a small synthetic stream:

- with sentinels: every unmatched purchase is emitted with nulls
  (the watermark passed its window, state flushed);
- without: the replay terminates with those rows still buffered in
  the state store and the outer join silently degrades to the inner
  join's output — the undercount the sentinel idiom exists to
  prevent.

If a future Spark version starts flushing outer-join state on
availableNow termination, the second assertion fails and the sentinel
machinery (plus this test) can be retired.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def _write_files(spark, base: str, rows, sentinel_ts: list[str]) -> None:
    os.makedirs(base)
    stage = base + "_stage"
    schema = "event_id long, ts timestamp, user_id long"
    pieces = [spark.createDataFrame(rows, schema).coalesce(1)]
    for ts in sentinel_ts:
        pieces.append(
            spark.createDataFrame([], schema).unionByName(
                spark.range(1).select(
                    F.lit(-1).cast("long").alias("event_id"),
                    F.to_timestamp(F.lit(ts)).alias("ts"),
                    F.lit(-1).cast("long").alias("user_id"),
                )
            ).coalesce(1)
        )
    t0 = 1_700_000_000
    for i, piece in enumerate(pieces):
        piece.write.mode("overwrite").parquet(stage)
        (part,) = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        dst = os.path.join(base, f"{i:03d}.parquet")
        shutil.copy(os.path.join(stage, part), dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    shutil.rmtree(stage, ignore_errors=True)


def _run_join(spark, work: str, name: str) -> list:
    schema = "event_id long, ts timestamp, user_id long"

    def side(sub):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(work, sub))
            .withWatermark("ts", "2 hours")
        )

    p, c = side("p").alias("p"), side("c").alias("c")
    cond = (
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") <= F.col("p.ts"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
    )
    joined = p.join(c, cond, "leftOuter").select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.user_id").alias("user_id"),
    )
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name).filter(F.col("user_id") >= 0).collect()


# 3 purchases: #1 has a click 30 min before (matches), #2's only
# same-user click is 3 h earlier (outside the 1 h band), #3's user
# never clicks — 1 matched row + 2 null rows expected
_PURCHASES = [
    (101, "2024-01-01 10:00:00", 1),
    (102, "2024-01-01 11:00:00", 2),
    (103, "2024-01-01 12:00:00", 3),
]
_CLICKS = [
    (201, "2024-01-01 09:30:00", 1),
    (202, "2024-01-01 08:00:00", 2),
]
_SENTINELS = ["2024-06-01 00:00:00", "2024-06-02 00:00:00"]


def _ts(rows):
    return [(e, __import__("datetime").datetime.fromisoformat(t), u) for e, t, u in rows]


def test_sentinels_flush_unmatched_rows(spark):
    work = tempfile.mkdtemp(prefix="ojoin_sentinel_")
    _write_files(spark, os.path.join(work, "p"), _ts(_PURCHASES), _SENTINELS)
    _write_files(spark, os.path.join(work, "c"), _ts(_CLICKS), _SENTINELS)
    rows = _run_join(spark, work, "ojoin_with_sentinels")
    shutil.rmtree(work, ignore_errors=True)
    got = {(r["purchase_id"], r["click_id"]) for r in rows}
    assert got == {(101, 201), (102, None), (103, None)}


def test_without_sentinels_outer_rows_stay_buffered(spark):
    work = tempfile.mkdtemp(prefix="ojoin_plain_")
    _write_files(spark, os.path.join(work, "p"), _ts(_PURCHASES), [])
    _write_files(spark, os.path.join(work, "c"), _ts(_CLICKS), [])
    rows = _run_join(spark, work, "ojoin_without_sentinels")
    shutil.rmtree(work, ignore_errors=True)
    got = {(r["purchase_id"], r["click_id"]) for r in rows}
    # only the inner match surfaces; the two unmatched purchases die
    # in the state store when the bounded replay terminates
    assert got == {(101, 201)}


def _run_full_join(spark, work: str, name: str) -> list:
    """Full-outer twin of _run_join: unmatched rows from BOTH state
    stores must flush (purchase-side nulls need the click watermark
    raised and vice versa)."""
    schema = "event_id long, ts timestamp, user_id long"

    def side(sub):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(work, sub))
            .withWatermark("ts", "2 hours")
        )

    p, c = side("p").alias("p"), side("c").alias("c")
    cond = (
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") <= F.col("p.ts"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
    )
    joined = p.join(c, cond, "fullOuter").select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.event_id").alias("click_id"),
        F.coalesce(F.col("p.user_id"), F.col("c.user_id")).alias("user_id"),
    )
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name).filter(F.col("user_id") >= 0).collect()


# click 203 (user 9) never precedes a purchase — it is the RIGHT-side
# unmatched row the full join must emit with a null purchase
_CLICKS_FULL = _CLICKS + [(203, "2024-01-01 13:00:00", 9)]


def test_full_outer_sentinels_flush_both_sides(spark):
    work = tempfile.mkdtemp(prefix="fojoin_sentinel_")
    _write_files(spark, os.path.join(work, "p"), _ts(_PURCHASES), _SENTINELS)
    _write_files(spark, os.path.join(work, "c"), _ts(_CLICKS_FULL), _SENTINELS)
    rows = _run_full_join(spark, work, "fojoin_with_sentinels")
    shutil.rmtree(work, ignore_errors=True)
    got = {(r["purchase_id"], r["click_id"]) for r in rows}
    # matched + 2 left-unmatched + 2 right-unmatched (click 202 is
    # outside purchase 102's 1h band, so BOTH emit null-padded)
    assert got == {
        (101, 201),
        (102, None),
        (103, None),
        (None, 202),
        (None, 203),
    }


def test_full_outer_without_sentinels_undercounts_both_sides(spark):
    work = tempfile.mkdtemp(prefix="fojoin_plain_")
    _write_files(spark, os.path.join(work, "p"), _ts(_PURCHASES), [])
    _write_files(spark, os.path.join(work, "c"), _ts(_CLICKS_FULL), [])
    rows = _run_full_join(spark, work, "fojoin_without_sentinels")
    shutil.rmtree(work, ignore_errors=True)
    got = {(r["purchase_id"], r["click_id"]) for r in rows}
    # the data's own watermark (min over both sides: max purchase ts
    # 12:00 - 2h = 10:00) closes click 202's window (09:00) before
    # the replay ends, so that one unmatched row DOES surface — but
    # everything nearer the end of stream (null rows for purchases
    # 102/103, click 203) dies in the state stores: the undercount
    # the sentinel drain exists to prevent, now on both sides
    assert got == {(101, 201), (None, 202)}
