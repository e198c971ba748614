"""Recall test for the sign-plane LSH embedding dedup on data with
REAL near-duplicates (the synthetic corpus is near-orthogonal, so the
registered query exercises machinery; this exercises retrieval)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from etl_xlsx_potgres_spark.plans.similarity import sign_plane_signature

DIM = 32
THRESHOLD = 0.9


def _clustered_vectors(seed: int, n_base: int = 60):
    rng = random.Random(seed)
    vecs = []
    for base_id in range(n_base):
        base = [rng.gauss(0, 1) for _ in range(DIM)]
        vecs.append(base)
        # near-duplicate: small perturbation (cos > ~0.99)
        vecs.append([x + rng.gauss(0, 0.02) for x in base])
        # decoy: independent vector
        vecs.append([rng.gauss(0, 1) for _ in range(DIM)])
    return [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_lsh_banded_neardup_recall(spark):
    rows = _clustered_vectors(3)
    true_pairs = {
        (i, j)
        for i, a in rows
        for j, b in rows
        if i < j and _cos(a, b) >= THRESHOLD
    }
    assert len(true_pairs) >= 50  # the generator really makes near-dups

    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    sig = df.withColumn("sig", sign_plane_signature("embedding", dim=DIM))
    bands = sig.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.array(*[F.substring("sig", b * 4 + 1, 4) for b in range(4)])
        ).alias("b", "bk"),
    )
    a = bands.select(F.col("vec_id").alias("v1"), F.col("embedding").alias("ea"), "b", "bk")
    bb = bands.select(F.col("vec_id").alias("v2"), F.col("embedding").alias("eb"), "b", "bk")
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    got = {
        (int(r.v1), int(r.v2))
        for r in (
            a.join(bb, ["b", "bk"])
            .filter(F.col("v1") < F.col("v2"))
            .select("v1", "v2", "ea", "eb")
            .distinct()
            .select("v1", "v2", (dot / (norm("ea") * norm("eb"))).alias("cosine"))
            .filter(F.col("cosine") >= THRESHOLD)
            .collect()
        )
    }
    # precision is exact by construction (cosine verify); recall must
    # be high for genuine near-dups (cos>=0.9 -> band match w.h.p.)
    assert got <= true_pairs
    recall = len(got & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"recall {recall:.3f} on {len(true_pairs)} true pairs"


def test_dot_implementations_bit_identical(spark):
    """The three dot-product implementations — the unrolled flat chain
    (kept as the reference formulation after the r9 64 KB codegen
    postmortem), the zip_with/aggregate HOF fold the shipped queries
    use, and the Arrow-batched pandas fold — must agree BIT-FOR-BIT on
    adversarial doubles, because the oracle differential and the
    cosine-threshold boundary both depend on the exact left-assoc
    float order. A pairwise/tree summation in any of them would break
    this on these inputs."""
    import math
    import random

    from etl_xlsx_potgres_spark.plans.similarity import (
        EMB_DIM,
        dot_flat,
        dot_pairs_pandas,
    )

    rng = random.Random(9)
    # magnitudes spread over 12 orders so summation order matters
    rows = [
        (
            i,
            [rng.uniform(-1, 1) * 10 ** rng.randint(-6, 6) for _ in range(EMB_DIM)],
            [rng.uniform(-1, 1) * 10 ** rng.randint(-6, 6) for _ in range(EMB_DIM)],
        )
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["i", "ea", "eb"]).select(
        "i",
        F.col("ea").cast("array<float>").alias("ea"),
        F.col("eb").cast("array<float>").alias("eb"),
    )
    hof = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    out = df.select(
        "i",
        dot_flat("ea", "eb").alias("flat"),
        hof.alias("hof"),
        dot_pairs_pandas(F.col("ea"), F.col("eb")).alias("arrow"),
    ).collect()
    assert len(out) == 50
    for r in out:
        assert math.isfinite(r.flat)
        # bit-identity, not approx: == on python floats is exact
        assert r.flat == r.hof == r.arrow, r.i
