"""Property test for the degree-oriented triangle counter: on seeded
random graphs the distributed adjacency-intersection count must equal
brute-force enumeration over all vertex triples. The oracle gate
checks ONE graph (the co-purchase projection); this sweeps graph
shapes the orientation logic must survive — degree ties everywhere
(regular-ish graphs), stars (one high-degree hub), and near-cliques
(every wedge closes).
"""

from __future__ import annotations

import itertools
import random

import pytest

from etl_xlsx_potgres_spark.plans.graph_triangles import triangle_summary


def _random_graph(seed: int, n: int, p: float) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (u, v)
        for u, v in itertools.combinations(range(n), 2)
        if rng.random() < p
    ]


def _brute(edges: list[tuple[int, int]]) -> dict[str, int]:
    es = set(edges)
    verts = sorted({w for e in edges for w in e})
    deg = {w: 0 for w in verts}
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    tri = sum(
        1
        for x, y, z in itertools.combinations(verts, 3)
        if (x, y) in es and (y, z) in es and (x, z) in es
    )
    return {
        "n_vertices": len(verts),
        "n_edges": len(edges),
        "max_degree": max(deg.values()) if deg else 0,
        "n_triangles": tri,
    }


@pytest.mark.parametrize(
    "seed,n,p",
    [
        (1, 18, 0.25),   # sparse: most wedges open
        (2, 14, 0.75),   # near-clique: ties + dense closes
        (3, 25, 0.12),   # larger sparse
        (4, 10, 1.0),    # complete graph: C(10,3) = 120 exactly
    ],
)
def test_matches_brute_force(spark, seed, n, p):
    from etl_xlsx_potgres_spark import caching

    edges = _random_graph(seed, n, p)
    want = _brute(edges)
    df = spark.createDataFrame(edges, "u long, v long")
    got = triangle_summary(df).collect()[0].asDict()
    caching.release_persisted()
    assert got == want


def test_star_graph_has_no_triangles(spark):
    from etl_xlsx_potgres_spark import caching

    # hub 0 with 40 leaves: max wedge count at the hub, zero closes —
    # the shape the degree orientation exists for (the hub sources no
    # oriented edges, so no wedge is even enumerated at it)
    edges = [(0, v) for v in range(1, 41)]
    got = triangle_summary(
        spark.createDataFrame(edges, "u long, v long")
    ).collect()[0]
    caching.release_persisted()
    assert got["n_triangles"] == 0
    assert got["max_degree"] == 40
