"""Every ``persist()``/``cache()`` in the query layer must have a
paired release.

CacheManager entries are not garbage-collected with the Python
DataFrame object, so an unpaired persist leaks executor storage and
driver cache metadata across a long-lived session. The pairing is
enforced structurally:

1. ``plans/`` may not call raw ``.persist()``/``.cache()`` at all —
   sites route through ``caching.scoped_persist`` (registered for
   release). ``localCheckpoint`` is exempt: its blocks ARE reclaimed
   by the ContextCleaner on RDD GC.
2. The harness (``__spark_entry__`` adapter, ``bench.py``) calls
   ``caching.release_persisted()`` between queries.
3. Runtime check: running a persisting query and releasing leaves no
   scoped frame behind and empties the session cache.
"""

from __future__ import annotations

import ast
import glob
import os

import pytest

from etl_xlsx_potgres_spark import caching

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PLANS = os.path.join(_REPO, "etl_xlsx_potgres_spark", "plans")


def _raw_persist_calls(path: str) -> list[tuple[int, str]]:
    tree = ast.parse(open(path).read(), filename=path)
    hits = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in ("persist", "cache")
        ):
            hits.append((node.lineno, node.func.attr))
    return hits


def test_no_raw_persist_in_plans():
    """AST sweep: zero raw .persist()/.cache() calls anywhere under
    plans/ — every cache site is a scoped_persist (paired release)."""
    offenders = {}
    for path in sorted(glob.glob(os.path.join(_PLANS, "*.py"))):
        hits = _raw_persist_calls(path)
        if hits:
            offenders[os.path.basename(path)] = hits
    assert not offenders, (
        f"raw persist/cache calls in plans/ (use caching.scoped_persist): {offenders}"
    )


def test_scoped_persist_is_the_only_persist_path():
    """The one raw .persist() in the package is scoped_persist's own
    implementation (caching.py); operators/sources/sinks/pipelines/
    functions/streaming have none."""
    pkg = os.path.join(_REPO, "etl_xlsx_potgres_spark")
    raw = {}
    for path in sorted(glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True)):
        rel = os.path.relpath(path, pkg)
        if rel.startswith("plans") or rel == "caching.py":
            continue
        hits = _raw_persist_calls(path)
        if hits:
            raw[rel] = hits
    assert not raw, f"unscoped persist/cache outside plans/: {raw}"


def test_harness_releases_between_queries():
    """__spark_entry__'s per-query adapter and bench's per-run loop
    both call caching.release_persisted()."""
    for rel in ("__spark_entry__.py", "bench.py"):
        src = open(os.path.join(_REPO, rel)).read()
        assert "release_persisted()" in src, f"{rel} never releases scoped frames"


@pytest.mark.parametrize("qname", ["text_bpe_merge_rounds"])
def test_release_after_action_leaves_no_cache(spark, sf_dir, qname):
    """End-to-end pairing on the query the r10 verdict flagged
    (plans/bpe_train.py vocab persist): run, release, and assert both
    the scope registry and the session cache are empty."""
    from etl_xlsx_potgres_spark import registry

    registry.load_all()
    caching.release_persisted()
    spark.catalog.clearCache()

    before = caching.live_count()
    df = registry.QUERIES[qname](spark, sf_dir)
    assert df.count() > 0
    assert caching.live_count() > before, "query no longer uses scoped_persist"

    released = caching.release_persisted()
    assert released >= 1
    assert caching.live_count() == 0
    jcat = spark._jsparkSession.sharedState().cacheManager()
    assert jcat.isEmpty(), "session cache not empty after release_persisted()"
