"""Write-side of the xlsx Python Data Source: one workbook per
partition from Arrow batches, overwrite semantics, commit manifest,
and abort cleanup (no manifest -> nothing published)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from etl_xlsx_potgres_spark.sources.xlsx_datasource import (
    register_xlsx_source,
)


def _df(spark, n=40):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("name-"), F.col("id")).alias("name"),
            (F.col("id") * 2 + 1).alias("v"),
        )
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    register_xlsx_source(spark)
    out = str(tmp_path / "export")
    _df(spark).repartition(4, "k").write.format("xlsx").mode(
        "overwrite"
    ).save(out)
    files = glob.glob(os.path.join(out, "*.xlsx"))
    assert 1 <= len(files) <= 4
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["rows"] == 40
    assert sorted(e["path"] for e in manifest["files"]) == sorted(files)
    assert sum(e["rows"] for e in manifest["files"]) == 40
    back = spark.read.format("xlsx").load(out)
    got = {(r["k"], r["name"], r["v"]) for r in back.collect()}
    want = {(i, f"name-{i}", 2 * i + 1) for i in range(40)}
    assert got == want


def test_overwrite_clears_previous_export(spark, tmp_path):
    register_xlsx_source(spark)
    out = str(tmp_path / "export_ow")
    _df(spark, 10).coalesce(1).write.format("xlsx").mode("overwrite").save(out)
    first = set(glob.glob(os.path.join(out, "*.xlsx")))
    assert len(first) == 1
    _df(spark, 7).coalesce(1).write.format("xlsx").mode("overwrite").save(out)
    second = set(glob.glob(os.path.join(out, "*.xlsx")))
    assert len(second) == 1 and not (first & second), (
        "stale workbook survived overwrite"
    )
    assert spark.read.format("xlsx").load(out).count() == 7


def test_empty_partitions_write_no_files(spark, tmp_path):
    register_xlsx_source(spark)
    out = str(tmp_path / "export_empty")
    _df(spark, 3).repartition(8, "k").write.format("xlsx").mode(
        "overwrite"
    ).save(out)
    files = glob.glob(os.path.join(out, "*.xlsx"))
    assert 1 <= len(files) <= 3, "empty partitions must not emit workbooks"
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        assert json.load(f)["rows"] == 3


def test_failed_job_publishes_no_manifest(spark, tmp_path):
    register_xlsx_source(spark)
    out = str(tmp_path / "export_fail")
    poisoned = _df(spark).withColumn(
        "name",
        F.when(
            F.col("k") == 17, F.raise_error(F.lit("poisoned row"))
        ).otherwise(F.col("name")),
    )
    with pytest.raises(Exception):
        poisoned.repartition(4, "k").write.format("xlsx").mode(
            "overwrite"
        ).save(out)
    # commit never ran: nothing was published even if some tasks
    # finished before the failure (abort removes their files)
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))


def test_stream_writer_multi_batch_roundtrip(tmp_path):
    """write_xlsx_stream must produce the same workbook whether rows
    arrive as one batch or many (the executor path feeds one list per
    Arrow batch), and the manifest-free stdlib reader must get every
    row back in order."""
    from etl_xlsx_potgres_spark.sources import xlsx_stdlib

    rows = [[i, f"name-{i}", 2 * i + 1] for i in range(57)]
    one = str(tmp_path / "one.xlsx")
    many = str(tmp_path / "many.xlsx")
    n1 = xlsx_stdlib.write_xlsx_stream(one, ["k", "name", "v"], [rows])
    batches = [rows[i : i + 10] for i in range(0, len(rows), 10)]
    n2 = xlsx_stdlib.write_xlsx_stream(many, ["k", "name", "v"], batches)
    assert n1 == n2 == 57
    h1, r1 = xlsx_stdlib.read_rows(one, 0)
    h2, r2 = xlsx_stdlib.read_rows(many, 0)
    assert h1 == h2 == ["k", "name", "v"]
    assert r1 == r2 and len(r1) == 57


def test_overwrite_removes_stale_manifest(spark, tmp_path):
    """A successful overwrite deletes the PREVIOUS _MANIFEST.json up
    front, so a failed new job can't leave a manifest listing deleted
    workbooks (r14 ADVICE)."""
    import pyspark.sql.functions as F

    register_xlsx_source(spark)
    out = str(tmp_path / "export_stale_manifest")
    _df(spark, 5).coalesce(1).write.format("xlsx").mode("overwrite").save(out)
    assert os.path.exists(os.path.join(out, "_MANIFEST.json"))
    boom = _df(spark, 5).withColumn(
        "v", F.expr("CASE WHEN v >= 0 THEN raise_error('boom') ELSE v END")
    )
    try:
        boom.coalesce(1).write.format("xlsx").mode("overwrite").save(out)
        raise AssertionError("job should have failed")
    except Exception:
        pass
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json")), (
        "stale manifest survived a failed overwrite"
    )
