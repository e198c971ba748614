"""The chunked EWMA fallback must be the SAME function as the plain
per-entity fold, modulo float rounding: the chunk composition is an
exact algebraic regrouping of the recurrence, and with alpha = 1/2
every decay scaling is an exact power of two, so only the additions
round differently. n_obs/first/last are integers/reads — exact."""

from __future__ import annotations

import math

from etl_xlsx_potgres_spark import registry

registry.load_all()


def test_chunked_matches_plain_ewma(spark, sf_dir):
    plain = {
        (r["user_id"], r["event_type"]): r
        for r in registry.QUERIES["ts_ewma_by_user_type"](spark, sf_dir)
        .collect()
    }
    chunked = {
        (r["user_id"], r["event_type"]): r
        for r in registry.QUERIES["ts_ewma_chunked"](spark, sf_dir).collect()
    }
    assert set(plain) == set(chunked)
    for key, p in plain.items():
        c = chunked[key]
        assert c["n_obs"] == p["n_obs"]
        assert c["first_value"] == p["first_value"]
        assert c["last_value"] == p["last_value"]
        assert math.isclose(c["ewma"], p["ewma"], rel_tol=1e-12, abs_tol=1e-12), (
            key, c["ewma"], p["ewma"]
        )


def test_chunk_boundaries_exercised(spark, sf_dir):
    """The fixture must actually produce multi-chunk entities, or the
    composition path is vacuously tested."""
    from pyspark.sql import functions as F

    from etl_xlsx_potgres_spark.plans.ewma_chunked import CHUNK
    from etl_xlsx_potgres_spark.sources import load_table

    sizes = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .count()
    )
    multi = sizes.filter(F.col("count") > CHUNK).count()
    assert multi > 0, f"no entity exceeds CHUNK={CHUNK}; raise fixture density"
