"""write_partitioned: partition-pruned layout + dynamic-overwrite
backfill semantics (replace only the partitions present in the new
frame; static overwrite would drop the rest of the table)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_xlsx_potgres_spark.sinks import write_partitioned  # noqa: E402


def test_layout_and_pruned_scan(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    df = spark.createDataFrame(
        [(1, "click", 1.0), (2, "view", 2.0), (3, "click", 3.0)],
        "event_id long, event_type string, value double",
    )
    write_partitioned(df, path, ["event_type"])
    # hive-style directory layout
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("event_type=")
    ) == ["event_type=click", "event_type=view"]
    # a filtered read only touches the matching partition directory
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    files = {r[0] for r in back.select(F.input_file_name()).distinct().collect()}
    assert all("event_type=click" in f for f in files)
    assert back.count() == 2


def test_dynamic_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "backfill")
    full = spark.createDataFrame(
        [(1, "click", 1.0), (2, "view", 2.0), (3, "error", 3.0)],
        "event_id long, event_type string, value double",
    )
    write_partitioned(full, path, ["event_type"])

    # backfill ONLY the click partition with corrected data
    fix = spark.createDataFrame(
        [(10, "click", 9.0), (11, "click", 9.5)],
        "event_id long, event_type string, value double",
    )
    write_partitioned(fix, path, ["event_type"])

    got = {
        (r["event_type"], r["event_id"])
        for r in spark.read.parquet(path).collect()
    }
    # click replaced, view and error intact
    assert got == {("click", 10), ("click", 11), ("view", 2), ("error", 3)}


def test_static_overwrite_truncates_table(spark, tmp_path):
    path = str(tmp_path / "static")
    full = spark.createDataFrame(
        [(1, "click", 1.0), (2, "view", 2.0)],
        "event_id long, event_type string, value double",
    )
    write_partitioned(full, path, ["event_type"])
    fix = spark.createDataFrame(
        [(10, "click", 9.0)], "event_id long, event_type string, value double"
    )
    write_partitioned(fix, path, ["event_type"], dynamic=False)
    rows = spark.read.parquet(path).collect()
    assert {(r["event_type"], r["event_id"]) for r in rows} == {("click", 10)}


def test_conf_restored_after_write(spark, tmp_path):
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    df = spark.createDataFrame([(1, "a")], "k long, p string")
    write_partitioned(df, str(tmp_path / "conf"), ["p"])
    assert spark.conf.get(key, "STATIC") == prev
