"""Offset logic of the xlsx streaming source, unit-level (no Spark
job): append-only lexicographic offsets must slice batches exactly
once per file, replay deterministically after a restart, and coerce
values through the same strict path as the batch reader."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from etl_xlsx_potgres_spark.sources.xlsx_datasource import (
    _XlsxStreamReader,
)
from etl_xlsx_potgres_spark.sources.xlsx_stdlib import write_xlsx

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _reader(d):
    return _XlsxStreamReader(_SCHEMA, {"path": str(d)})


def _write(d, name, rows):
    write_xlsx(os.path.join(str(d), name), ["id", "name"], rows)


def _rows(reader, parts):
    out = []
    for p in parts:
        out.extend(reader.read(p))
    return out


def test_offsets_advance_with_arrivals_and_slice_exactly(tmp_path):
    r = _reader(tmp_path)
    assert r.initialOffset() == {"n": 0}
    assert r.latestOffset() == {"n": 0}
    assert r.partitions({"n": 0}, {"n": 0}) == []

    _write(tmp_path, "part-00000.xlsx", [[1, "a"], [2, "b"]])
    _write(tmp_path, "part-00001.xlsx", [[3, "c"]])
    assert r.latestOffset() == {"n": 2}
    batch1 = _rows(r, r.partitions({"n": 0}, {"n": 2}))
    assert sorted(batch1) == [(1, "a"), (2, "b"), (3, "c")]

    # a later arrival is the NEXT batch only — no re-read of old files
    _write(tmp_path, "part-00002.xlsx", [[4, "d"]])
    assert r.latestOffset() == {"n": 3}
    batch2 = _rows(r, r.partitions({"n": 2}, {"n": 3}))
    assert batch2 == [(4, "d")]


def test_replay_is_deterministic_across_reader_instances(tmp_path):
    """Restart semantics: a committed [start, end) range re-read by a
    FRESH reader (new driver) yields the identical rows."""
    _write(tmp_path, "part-00000.xlsx", [[1, "a"]])
    _write(tmp_path, "part-00001.xlsx", [[2, "b"]])
    _write(tmp_path, "part-00002.xlsx", [[3, "c"]])
    first = _rows(_reader(tmp_path), _reader(tmp_path).partitions({"n": 1}, {"n": 3}))
    again = _rows(_reader(tmp_path), _reader(tmp_path).partitions({"n": 1}, {"n": 3}))
    assert first == again == [(2, "b"), (3, "c")]


def test_one_partition_per_file(tmp_path):
    for i in range(5):
        _write(tmp_path, f"part-{i:05d}.xlsx", [[i, "x"]])
    r = _reader(tmp_path)
    parts = r.partitions({"n": 1}, {"n": 4})
    assert len(parts) == 3  # micro-batch parallelism == new files
    assert [os.path.basename(p.value[0]) for p in parts] == [
        "part-00001.xlsx",
        "part-00002.xlsx",
        "part-00003.xlsx",
    ]


def test_header_drift_fills_missing_with_null(tmp_path):
    write_xlsx(os.path.join(str(tmp_path), "a.xlsx"), ["id"], [[7]])
    r = _reader(tmp_path)
    assert _rows(r, r.partitions({"n": 0}, {"n": 1})) == [(7, None)]


def test_incremental_arrival_live_stream(spark, tmp_path):
    """End-to-end: a running processingTime stream picks up a file
    that lands AFTER the stream started — the offset tracking works
    against a live listing, not just bounded replays."""
    import time

    from etl_xlsx_potgres_spark.sources.xlsx_datasource import (
        register_xlsx_source,
    )

    register_xlsx_source(spark)
    d = str(tmp_path / "landing")
    os.makedirs(d)
    _write(d, "part-00000.xlsx", [[1, "a"], [2, "b"]])
    name = "xlsx_stream_live_test"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    stream = spark.readStream.format("xlsx").schema(_SCHEMA).load(d)
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def wait_count(n, timeout=60):
            t0 = time.time()
            while time.time() - t0 < timeout:
                if spark.table(name).count() >= n:
                    break
                time.sleep(0.5)
            return spark.table(name).count()

        assert wait_count(2) == 2
        _write(d, "part-00001.xlsx", [[3, "c"]])
        assert wait_count(3) == 3
        got = {tuple(r) for r in spark.table(name).collect()}
        assert got == {(1, "a"), (2, "b"), (3, "c")}
    finally:
        q.stop()
