"""Cost-based join reordering: with table statistics collected
(ANALYZE TABLE) and CBO on, Catalyst rewrites a syntactically
big ⋈ mid ⋈ tiny join chain to build the smallest intermediate first
(mid ⋈ tiny) — the optimizer lever that turns a row-explosion join
order into a cheap one at warehouse scale, where query authors do not
hand-order their joins. The negative control pins that WITHOUT CBO
the syntactic order stands, so the assertion really measures the
stats-driven reorder and not some other rewrite.

Test-only demonstration (like runtime bloom-filter pruning): the
oracle-gated queries keep AQE's default cost model; this pins that
the engine's CBO path works in this Spark build should a deployment
enable it over ANALYZEd catalog tables.
"""

from __future__ import annotations

import re
import shutil

import pytest

_WH = "/tmp/spark_graft_cbo"
_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # force shuffle joins so size-based broadcast choices can't mask
    # the reorder decision
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}

_Q = """
SELECT count(*) AS n
FROM cbo_big b JOIN cbo_mid m ON b.k = m.k JOIN cbo_tiny t ON m.k = t.k
"""


@pytest.fixture(scope="module")
def cbo_tables(spark):
    shutil.rmtree(_WH, ignore_errors=True)
    for name, n in [("big", 200_000), ("mid", 5_000), ("tiny", 50)]:
        (
            spark.range(n)
            .selectExpr("id AS k", "id % 97 AS payload")
            .write.mode("overwrite")
            .option("path", f"{_WH}/{name}")
            .saveAsTable(f"cbo_{name}")
        )
        spark.sql(f"ANALYZE TABLE cbo_{name} COMPUTE STATISTICS")
    yield
    for name in ("big", "mid", "tiny"):
        spark.sql(f"DROP TABLE IF EXISTS cbo_{name}")
    shutil.rmtree(_WH, ignore_errors=True)


def _first_join_tables(plan: str) -> set[str]:
    """Table names referenced under the INNERMOST Join of the
    optimized plan string."""
    joins = [m.start() for m in re.finditer(r"\bJoin Inner", plan)]
    inner = plan[joins[-1]:]
    # the innermost join's subtree ends where indentation returns to
    # the outer level; table refs are unambiguous enough to just take
    # the first two relations after it
    rels = re.findall(r"default\.cbo_(\w+)", inner)
    return set(rels[:2])


def _with_confs(spark, confs):
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return prev


def _restore(spark, prev):
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_cbo_builds_smallest_intermediate_first(spark, cbo_tables):
    prev = _with_confs(spark, _CONFS)
    try:
        plan = spark.sql(_Q)._jdf.queryExecution().optimizedPlan().toString()
        assert _first_join_tables(plan) == {"mid", "tiny"}, plan[:1200]
        # reorder must not change the answer
        assert spark.sql(_Q).collect()[0]["n"] == 50
    finally:
        _restore(spark, prev)


def test_without_cbo_syntactic_order_stands(spark, cbo_tables):
    prev = _with_confs(spark, {**_CONFS, "spark.sql.cbo.enabled": "false",
                               "spark.sql.cbo.joinReorder.enabled": "false"})
    try:
        plan = spark.sql(_Q)._jdf.queryExecution().optimizedPlan().toString()
        assert _first_join_tables(plan) == {"big", "mid"}, plan[:1200]
    finally:
        _restore(spark, prev)
