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


def test_chunk_size_invariance(spark, sf_dir):
    """VERDICT r12 task 5: the affine chunk composition must hold at
    chunk lengths other than the registered CHUNK=4 — L=2 (every
    boundary hit), L=4 (registered), L=64 (most fixture entities fit
    in one chunk, so the single-chunk fast path and the plain fold
    coincide). Same tolerance as the plain-fold comparison: the
    regrouping is exact algebra, the scalings are exact powers of
    two, only addition order differs."""
    import pytest

    from etl_xlsx_potgres_spark.plans.ewma_chunked import chunked_ewma_plan

    plain = {
        (r["user_id"], r["event_type"]): r
        for r in registry.QUERIES["ts_ewma_by_user_type"](spark, sf_dir)
        .collect()
    }
    for chunk in (2, 4, 64):
        got = {
            (r["user_id"], r["event_type"]): r
            for r in chunked_ewma_plan(spark, sf_dir, chunk).collect()
        }
        assert set(got) == set(plain), f"entity set mismatch at L={chunk}"
        for key, p in plain.items():
            c = got[key]
            assert c["n_obs"] == p["n_obs"], (chunk, key)
            assert c["first_value"] == p["first_value"], (chunk, key)
            assert c["last_value"] == p["last_value"], (chunk, key)
            assert math.isclose(
                c["ewma"], p["ewma"], rel_tol=1e-12, abs_tol=1e-12
            ), (chunk, key, c["ewma"], p["ewma"])


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
