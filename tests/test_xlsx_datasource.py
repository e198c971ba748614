"""Distributed xlsx ingestion via the Python Data Source API
(``sources/xlsx_datasource.py``): partition granularity, schema
inference from typed OOXML cells, explicit-schema coercion, per-file
header drift, sheet selection, and error surfaces."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from etl_xlsx_potgres_spark.sources.xlsx_datasource import (
    _coerce,
    _infer_field,
    register_xlsx_source,
)
from etl_xlsx_potgres_spark.sources.xlsx_stdlib import write_xlsx


@pytest.fixture(scope="module")
def xlsx_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("xlsx_ds")
    for f in range(4):
        rows = [
            [
                f * 100 + i,
                f"name {f}-{i}",
                None if i % 7 == 0 else i + 0.25,
                i % 2 == 0,
                dt.datetime(2022, 1, 1) + dt.timedelta(days=i),
            ]
            for i in range(50)
        ]
        write_xlsx(
            str(d / f"part{f}.xlsx"),
            ["id", "name", "score", "flag", "ts"],
            rows,
        )
    return str(d)


def test_one_partition_per_file_and_inferred_schema(spark, xlsx_dir):
    register_xlsx_source(spark)
    df = spark.read.format("xlsx").load(xlsx_dir)
    assert df.rdd.getNumPartitions() == 4  # file = task granularity
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("id", "bigint"),
        ("name", "string"),
        ("score", "double"),
        ("flag", "boolean"),
        ("ts", "timestamp"),
    ]
    assert df.count() == 200
    assert df.filter("score IS NULL").count() == 4 * 8  # i % 7 == 0
    row = df.filter("id = 308").collect()[0]
    assert row.name == "name 3-8"
    assert row.score == 8.25
    assert row.flag is True
    assert row.ts == dt.datetime(2022, 1, 9)


def test_catalyst_ops_on_top_of_source(spark, xlsx_dir):
    """The source composes with ordinary DataFrame ops — a grouped
    aggregate over the 4-file scan matches the generating formula."""
    register_xlsx_source(spark)
    df = spark.read.format("xlsx").load(xlsx_dir)
    got = {
        r.flag: r.n
        for r in df.groupBy("flag").count().withColumnRenamed("count", "n").collect()
    }
    assert got == {True: 100, False: 100}


def test_explicit_schema_and_header_drift(spark, tmp_path):
    """Columns match by NAME: a file with reordered/missing/extra
    headers still lands in the declared schema, missing -> NULL."""
    register_xlsx_source(spark)
    write_xlsx(
        str(tmp_path / "a.xlsx"), ["k", "v", "extra"], [[1, "one", 9], [2, "two", 9]]
    )
    write_xlsx(str(tmp_path / "b.xlsx"), ["v", "k"], [["three", 3]])
    write_xlsx(str(tmp_path / "c.xlsx"), ["k"], [[4]])
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    df = (
        spark.read.format("xlsx")
        .schema(schema)
        .load(str(tmp_path))
        .orderBy("k")
    )
    assert [tuple(r) for r in df.collect()] == [
        (1, "one"),
        (2, "two"),
        (3, "three"),
        (4, None),
    ]


def test_sheet_selection_by_name_and_star(spark, tmp_path):
    write_xlsx(
        str(tmp_path / "w.xlsx"), ["x"], [[1], [2]], sheet_name="Only"
    )
    register_xlsx_source(spark)
    by_name = (
        spark.read.format("xlsx")
        .option("sheet", "Only")
        .load(str(tmp_path / "w.xlsx"))
    )
    assert sorted(r.x for r in by_name.collect()) == [1, 2]
    star = (
        spark.read.format("xlsx")
        .option("sheet", "*")
        .load(str(tmp_path / "w.xlsx"))
    )
    assert star.count() == 2


def test_batch_rows_option_preserves_rows(spark, tmp_path):
    write_xlsx(
        str(tmp_path / "big.xlsx"), ["i"], [[i] for i in range(100)]
    )
    register_xlsx_source(spark)
    df = (
        spark.read.format("xlsx")
        .option("batchRows", "7")  # force many small Arrow batches
        .load(str(tmp_path / "big.xlsx"))
    )
    assert sorted(r.i for r in df.collect()) == list(range(100))


def test_missing_path_errors(spark, tmp_path):
    register_xlsx_source(spark)
    with pytest.raises(Exception, match="no xlsx files match"):
        spark.read.format("xlsx").load(str(tmp_path / "nowhere")).collect()


def test_infer_field_rules():
    cases = [
        ([True, False], "boolean"),
        ([1, 2, None], "bigint"),
        ([1, 2.5], "double"),
        ([dt.datetime(2020, 1, 1)], "timestamp"),
        (["a", 1], "string"),
        ([None, None], "string"),
        ([True, 3], "bigint"),  # bool subclasses int; mix widens
    ]
    for values, expected in cases:
        assert _infer_field("c", values).dataType.simpleString() == expected


def test_coerce_is_strict_where_lossy():
    assert _coerce(3.0, T.LongType(), "c") == 3
    with pytest.raises(ValueError, match="not an integer"):
        _coerce(3.5, T.LongType(), "c")
    with pytest.raises(ValueError, match="not a boolean"):
        _coerce(1, T.BooleanType(), "c")
    assert _coerce(True, T.StringType(), "c") == "true"
    assert _coerce(dt.datetime(2020, 1, 2), T.DateType(), "c") == dt.date(
        2020, 1, 2
    )


def test_inference_widens_across_sampled_files(spark, tmp_path):
    """r13 ADVICE: a later file with a float (or string) in a column
    the first file held as int must widen the inferred schema instead
    of failing the scan executor-side."""
    d = tmp_path / "drift"
    d.mkdir()
    write_xlsx(
        str(d / "a_first.xlsx"), ["k", "v", "w"],
        [[1, 10, "x"], [2, 20, "y"]],
    )
    write_xlsx(
        str(d / "b_second.xlsx"), ["k", "v", "w"],
        [[3, 30.5, "z"], [4, 40, 5]],  # v drifts to float, w to mixed
    )
    register_xlsx_source(spark)
    df = spark.read.format("xlsx").load(str(d))
    by_name = {f.name: f.dataType for f in df.schema.fields}
    assert isinstance(by_name["k"], T.LongType)
    assert isinstance(by_name["v"], T.DoubleType), "int|float must widen"
    assert isinstance(by_name["w"], T.StringType), "mixed must degrade"
    rows = {r["k"]: (r["v"], r["w"]) for r in df.collect()}
    assert rows[3] == (30.5, "z") and rows[1] == (10.0, "x")
    assert rows[4] == (40.0, "5")


def test_inference_unions_headers_across_sampled_files(spark, tmp_path):
    """A column present only in a later sampled file still lands in
    the schema; files missing it fill with NULL (header drift)."""
    d = tmp_path / "union"
    d.mkdir()
    write_xlsx(str(d / "a.xlsx"), ["k"], [[1], [2]])
    write_xlsx(str(d / "b.xlsx"), ["k", "extra"], [[3, "e3"]])
    register_xlsx_source(spark)
    df = spark.read.format("xlsx").load(str(d))
    assert [f.name for f in df.schema.fields] == ["k", "extra"]
    rows = {r["k"]: r["extra"] for r in df.collect()}
    assert rows == {1: None, 2: None, 3: "e3"}
