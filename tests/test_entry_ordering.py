"""The driver checks queries() in iteration order with a bounded
budget, so __spark_entry__ must yield unverified queries before ones
already proven green in committed CORRECTNESS_r*.json files."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from etl_xlsx_potgres_spark import registry  # noqa: E402


def test_ordering_is_a_permutation_of_the_registry():
    registry.load_all()
    names = entry_mod._ordered_names()
    assert sorted(names) == sorted(registry.QUERIES)


def test_unverified_queries_come_before_verified_green():
    registry.load_all()
    names = entry_mod._ordered_names()
    green = entry_mod._verified_green()
    if not green or green == set(names):
        return  # nothing recorded yet, or everything green — no split
    first_green = min(names.index(n) for n in green)
    last_pending = max(names.index(n) for n in names if n not in green)
    assert last_pending < first_green


def test_vacuous_and_failed_rows_do_not_count_as_green():
    # round 1: dedup_embedding_neardup passed on 0 rows (vacuous),
    # split_train_val_test failed hash — both must be re-verified first
    green = entry_mod._verified_green()
    assert "dedup_embedding_neardup" not in green
    assert "split_train_val_test" not in green


def test_queries_and_oracles_share_names():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # oracle-less queries are the documented non-SQL-expressible set
    assert {n for n in q if n not in o} == {
        "ann_ml_brp_lsh",
        "agg_approx_sketches",
    }


def test_newly_oracled_queries_are_reprioritized():
    # these passed round 1 as weaker no_oracle rows-only checks, then
    # gained full oracles — they must queue for re-verification
    registry.load_all()
    green = entry_mod._verified_green()
    for name in ("graph_pagerank_trade", "join_asof_cogrouped", "ann_lsh_topk"):
        assert name in registry.ORACLES
        assert name not in green
