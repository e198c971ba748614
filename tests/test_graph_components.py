"""connected_components: min-label propagation over an undirected
edge list — exactness invariants on hand-built graphs (the
registered dedup_connected_components query gets the differential
recursive-CTE oracle; these cover the operator in isolation)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from etl_xlsx_potgres_spark.plans.graph_components import (  # noqa: E402
    connected_components,
)


def _components(spark, edge_rows):
    edges = spark.createDataFrame(edge_rows, "src long, dst long")
    out = connected_components(edges)
    return {r["v"]: r["component"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter > 1 forces multiple propagation rounds
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_direction_independence(spark):
    # edge direction must not matter (10,9) vs (9,10)
    got = _components(spark, [(10, 9), (9, 8), (1, 2), (30, 31)])
    assert got == {8: 8, 9: 8, 10: 8, 1: 1, 2: 1, 30: 30, 31: 30}


def test_cycle_and_cross_link(spark):
    # cycle 5-6-7-5 linked into 1-2: all one component rooted at 1
    got = _components(spark, [(5, 6), (6, 7), (7, 5), (2, 5), (1, 2)])
    assert set(got.values()) == {1}


def test_component_members_agree_on_min(spark):
    import random

    rng = random.Random(8)
    # random forest over 40 vertices: every member's label must equal
    # the min vertex id of its (true) component
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _components(spark, edges)

    # union-find reference
    parent = list(range(40))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    roots = {}
    for v in got:
        roots.setdefault(find(v), []).append(v)
    for members in roots.values():
        want = min(members)
        for v in members:
            assert got[v] == want
