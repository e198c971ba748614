"""Differential test: every registered query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate so regressions surface in
`pytest` before a round ends. Oracle-less queries get a smoke check
(runs, stable schema, >=0 rows).
"""

from __future__ import annotations

import pytest

from etl_xlsx_potgres_spark import registry

from .oracle_utils import assert_frames_match

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_vs_oracle(name, spark, duck, sf_dir):
    sdf = registry.QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    oracle = registry.ORACLES.get(name)
    if oracle is None:
        assert len(sdf.schema.fields) > 0
        assert len(spark_pdf) >= 0
        return
    oracle_pdf = duck.sql(oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)
