"""Z-order layout: morton-code correctness + a real parquet-footer
data-skipping proof (the property the operator exists for)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_xlsx_potgres_spark.plans.zorder import (
    Z_BITS,
    cluster_by_zorder,
    zvalue,
)
from etl_xlsx_potgres_spark.sources import load_table


def _interleave_py(a: int, b: int, bits: int = Z_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 1023, 2047) for b in (0, 2, 7, 2047)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == _interleave_py(r.a, r.b), (r.a, r.b)


def test_zvalue_prefix_bounds_both_dims(spark):
    # every 2k-bit z-prefix is a rectangle: dropping 2k low bits
    # bounds each dimension's residual range to 2^k
    rows = [(a, b) for a in range(0, 2048, 97) for b in range(0, 2048, 101)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")
    )
    stats = (
        df.groupBy(F.shiftright("z", 14).alias("bucket"))
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        )
        .agg(F.max("sa").alias("sa"), F.max("sb").alias("sb"))
        .first()
    )
    assert stats.sa < 2048 / 16
    assert stats.sb < 2048 / 16


@pytest.fixture()
def events_coords(spark, sf_dir):
    """(a, b) both scaled onto [0, 2048) over the DATA's extent —
    z-order interleaving assumes comparably-scaled dimensions (the
    same normalization Delta's OPTIMIZE ZORDER BY applies via
    range-ids); user_id cardinality varies with SF."""
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    width = max(1, hi - lo)
    return ev.select(
        (
            (F.expr("hour(ts) * 60 + minute(ts)") * 2047) / 1439
        ).cast("long").alias("a"),
        (((F.col("user_id") - lo) * 2047) / width).cast("long").alias("b"),
        "event_id",
    )


def _worst_dim_hit_fraction(path: str) -> float:
    """For each dimension: the expected fraction of files a uniform
    point predicate on that dimension must still read (mean footer
    span / dimension width). Return the worse of the two — the metric
    z-ordering optimizes: a single-column sort is perfect on one dim
    and ~1.0 on the other; z bounds both."""
    spans = {"a": [], "b": []}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        mins = {c: None for c in ("a", "b")}
        maxs = {c: None for c in ("a", "b")}
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for col_i, name in enumerate(schema_names):
                if name not in mins:
                    continue
                s = rg.column(col_i).statistics
                mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        for c in ("a", "b"):
            spans[c].append((maxs[c] - mins[c] + 1) / 2048.0)
    return max(sum(spans[c]) / len(spans[c]) for c in ("a", "b"))


def test_zorder_layout_skips_on_both_dims(spark, events_coords, tmp_path):
    n_files = 16
    z_path = str(tmp_path / "zorder")
    naive_path = str(tmp_path / "naive")

    cluster_by_zorder(
        events_coords, F.col("a"), F.col("b"), n_files
    ).write.mode("overwrite").parquet(z_path)
    # naive layout: range-sorted by a alone — tight on a, full-width b
    events_coords.repartitionByRange(n_files, "a").sortWithinPartitions(
        "a"
    ).write.mode("overwrite").parquet(naive_path)

    z_worst = _worst_dim_hit_fraction(z_path)
    naive_worst = _worst_dim_hit_fraction(naive_path)
    # single-column sort leaves the other dim ~full-width (worst ~1.0);
    # the z layout must at least halve the worst-dimension read
    # fraction (observed ~4x; loose margin so range-sampling noise
    # can't flake it)
    assert z_worst < naive_worst / 2.0, (z_worst, naive_worst)
