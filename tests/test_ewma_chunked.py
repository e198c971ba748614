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


def test_chunk_composition_algebra_random_inputs():
    """Property (hypothesis): the chunked closed-form combine
    ewma = sum_i contrib_i * (1-a)^(n - cumlen_i) equals the plain
    sequential fold for ARBITRARY finite inputs and chunk lengths —
    the fixture tests pin the Spark plan; this pins the algebra
    itself. With a = 1/2 every decay scaling is exact, so the only
    divergence channel is addition order (bounded by 1e-12 rel)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_xlsx_potgres_spark.plans.ewma_chunked import ALPHA

    vals = st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1, max_size=200,
    )

    @settings(max_examples=200, deadline=None)
    @given(xs=vals, chunk=st.integers(min_value=1, max_value=64))
    def check(xs, chunk):
        # plain fold, seeded with the head (the plan's initialization)
        plain = xs[0]
        for x in xs[1:]:
            plain = ALPHA * x + (1 - ALPHA) * plain
        # chunked: per-chunk affine contribs, closed-form combine
        n = len(xs)
        contribs = []
        cum = 0
        for lo in range(0, n, chunk):
            seg = xs[lo:lo + chunk]
            if lo == 0:
                acc = seg[0]
                rest = seg[1:]
            else:
                acc = 0.0
                rest = seg
            for x in rest:
                acc = ALPHA * x + (1 - ALPHA) * acc
            cum += len(seg)
            contribs.append((acc, cum))
        ewma = 0.0
        for contrib, cumlen in contribs:
            ewma += contrib * (1 - ALPHA) ** (n - cumlen)
        assert math.isclose(ewma, plain, rel_tol=1e-12, abs_tol=1e-9), (
            chunk, n, ewma, plain
        )

    check()
