"""The curation pipeline's materialization policy is explicit code:
all three modes must produce identical results, and the checkpoint
mode must actually truncate lineage (the 100 TB posture)."""

from __future__ import annotations

import pytest

from etl_xlsx_potgres_spark.plans.curation import (
    curate_corpus,
    curation_stats,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("mode", ["checkpoint", "none"])
def test_materialize_modes_agree_with_cache(spark, sf_dir, mode):
    base = _rows(curation_stats(curate_corpus(spark, sf_dir, "cache")))
    spark.catalog.clearCache()
    other = _rows(curation_stats(curate_corpus(spark, sf_dir, mode)))
    assert base == other


def test_checkpoint_mode_truncates_lineage(spark, sf_dir):
    kept = curate_corpus(spark, sf_dir, materialize="checkpoint")
    kept.write.format("noop").mode("overwrite").save()
    # after materialization the survivor frame's plan must be a
    # checkpoint scan, not the full dedup program
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Checkpoint" in plan or "LocalTableScan" in plan or "Scan ExistingRDD" in plan


def test_invalid_mode_rejected(spark, sf_dir):
    with pytest.raises(ValueError, match="materialize"):
        curate_corpus(spark, sf_dir, materialize="disk")
