"""Scoped persist: every ``persist()``/``cache()`` in the query layer
gets a PAIRED release.

Why. ``DataFrame.persist`` entries live in the session's CacheManager
keyed by logical plan — they are NOT garbage-collected when the Python
DataFrame object dies (unlike ``localCheckpoint`` blocks, which the
ContextCleaner reclaims on RDD GC). A long-lived user session that
runs many registry queries therefore accumulates dead cache entries
unless each persist is released. The harness already bounded this
with ``spark.catalog.clearCache()`` between queries; this module makes
the pairing explicit and machine-checkable:

- plans modules call :func:`scoped_persist` instead of raw
  ``.persist()``/``.cache()`` (enforced by
  ``tests/test_cache_pairing.py``, which forbids raw persist calls in
  ``plans/``);
- after the caller's action, :func:`release_persisted` (or the
  :func:`persist_scope` context manager) unpersists every registered
  frame. The harness (``__spark_entry__``, ``bench.py``,
  ``tools/strict_check.py``) calls it between queries.

Release must come AFTER the action: registry queries return lazy
DataFrames, so unpersisting inside the query body would defeat the
cache before anything is computed.

100-TB note: scoping changes *lifetime*, not plan shape — the
persisted frames themselves stay bounded (vocab-, segment-, or
edge-sized, per each call site's docstring); this guards the driver's
CacheManager metadata and executor storage from unbounded growth
across a many-query session.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` that registers the frame for paired release.

    Default storage level is Spark's DataFrame default
    (MEMORY_AND_DISK_DESER — the same level ``.cache()`` uses), so
    this is a drop-in replacement for both ``.persist()`` and
    ``.cache()`` call sites.
    """
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    _LIVE.append(out)
    return out


def live_count() -> int:
    """Number of scoped frames not yet released (test/debug hook)."""
    return len(_LIVE)


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every scoped frame registered since the last release;
    returns how many were released. Safe to call with the session
    already stopped (releases become no-ops)."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=blocking)
        except Exception:
            pass  # session torn down; nothing left to release
        n += 1
    return n


@contextmanager
def persist_scope():
    """Scope for user sessions: frames persisted inside the block are
    released on exit. Run the ACTION inside the block —

        with persist_scope():
            df = queries()["text_bm25_search"](spark, sf)
            df.write.parquet(out)   # action happens in-scope
    """
    mark = len(_LIVE)
    try:
        yield
    finally:
        while len(_LIVE) > mark:
            df = _LIVE.pop()
            try:
                df.unpersist()
            except Exception:
                pass
