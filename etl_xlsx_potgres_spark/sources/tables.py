"""Declared-schema parquet readers for the driver test tables.

The reference infers schemas twice (pandas then Spark,
``/root/reference/importador.py:47`` and
``/root/reference/etl_process.py:203``). The engine declares every
schema (SURVEY.md §1.3): inference costs an extra scan job and can
silently drift between files; a declared ``StructType`` pins column
types once and lets the vectorized parquet reader do schema pruning
against it.

Schemas mirror FIXTURES.md §B. ``spark.read.schema(...).parquet(...)``
keeps column pruning + predicate pushdown fully effective (both are
resolved against the declared schema at plan time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, T.StructType] = {
    "region": _struct(
        ("r_regionkey", T.IntegerType()),
        ("r_name", T.StringType()),
    ),
    "nation": _struct(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _struct(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _struct(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _struct(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _struct(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _struct(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": _struct(
        ("event_id", T.LongType()),
        ("ts", T.TimestampType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
}

# Some fixture generations write events.ts as parquet TIMESTAMP(NANOS),
# which Spark's reader rejects ([PARQUET_TYPE_ILLEGAL]). When (and only
# when) the footer actually says nanos, read it as raw int64 nanos and
# truncate to micros (integer division — matches DuckDB's ns->us
# truncation), so downstream code and the oracle see identical
# TimestampType values. Micros fixtures read via the declared schema
# directly — applying the div-1000 shim to micros data would shift every
# timestamp 1000x into Jan 1970.
_NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}

# path -> whether the footer declares any _NANOS_TS_COLS column as nanos.
# Footer probe is one small metadata read; cache so repeated load_table
# calls (tests, bench, entry rotation) don't re-read it.
_NANOS_PROBE_CACHE: dict[str, bool] = {}


def _has_nanos_ts(path: str, cols: list[str]) -> bool:
    cached = _NANOS_PROBE_CACHE.get(path)
    if cached is not None:
        return cached
    try:
        import glob
        import os

        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                raise FileNotFoundError(path)
            probe = parts[0]
        import pyarrow as pa

        schema = pq.read_schema(probe)
        # type-based probe, not string equality: tz-aware nanos render
        # as "timestamp[ns, tz=UTC]" and must still take the shim path
        nanos = any(
            c in schema.names
            and pa.types.is_timestamp(schema.field(c).type)
            and schema.field(c).type.unit == "ns"
            for c in cols
        )
    except Exception:
        # No pyarrow / unreadable footer: assume the modern micros layout
        # and let the declared-schema read surface any real type error.
        nanos = False
    _NANOS_PROBE_CACHE[path] = nanos
    return nanos

_RAW_SCHEMAS: dict[str, T.StructType] = {
    "events": _struct(
        ("event_id", T.LongType()),
        ("ts", T.LongType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
}

SCHEMAS["documents"] = _struct(
    ("doc_id", T.LongType()),
    ("text", T.StringType()),
    ("lang", T.StringType()),
    ("source", T.StringType()),
    ("n_chars", T.LongType()),
)
SCHEMAS["embeddings"] = _struct(
    ("vec_id", T.LongType()),
    ("embedding", T.ArrayType(T.FloatType())),
    ("label", T.IntegerType()),
)

TABLE_NAMES = tuple(SCHEMAS)

# Intake widening (r20, guide §2.5 "input skew: one huge unsplittable
# file ... repartition immediately after the read"): a parquet file is
# only splittable at row-group boundaries, so a table written as ONE
# row group runs every pre-shuffle map stage of every consumer on ONE
# core no matter how many scan splits Spark creates. When the layout
# provides fewer row groups than the session has cores, re-spread the
# rows once, hashed on the table's canonical key:
#
# - HASH, not round-robin: repartition(n) pays a per-task local sort
#   (spark.sql.execution.sortBeforeRepartition, needed for retry
#   determinism) on the single scan task — measured slower than the
#   map work it rescues on aggregate-light queries; hash on a data
#   column is retry-deterministic for free, and downstream
#   groupBy/joins keyed on the same column REUSE the exchange.
# - LAYOUT-GATED: at production volumes a table carries orders of
#   magnitude more row groups than the cluster has cores, so the
#   remedy disarms itself; it exists for exactly the pathological
#   layout the guide names.
# - Only the HEAVY-MAP tables are listed (documents: tokenize/gram/
#   hash/regex work per row; embeddings: 64-float vector math per
#   row). A/B over the suite showed the relational tables
#   (lineitem/orders/events) LOSE under intake widening: their map
#   work is cheap projections, their queries are shuffle-bound right
#   after the scan (the extra exchange double-moves the table), and
#   multi-consumer plans pay the respread once per consumer because
#   column pruning specializes each branch's exchange (no
#   ReusedExchange). Dimension tables are broadcast-sized and an
#   intake exchange would just lengthen their stage chains.
#
# SPARK_GRAFT_INTAKE_WIDEN=0 disables (the shuffle-budget census
# audits each query's semantic plan shape without the layout remedy).
_INTAKE_KEYS: dict[str, str] = {
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# path -> total row-group count across part files (footer metadata
# reads, cached like the nanos probe).
_ROW_GROUP_CACHE: dict[str, int] = {}


def _row_groups(path: str) -> int:
    cached = _ROW_GROUP_CACHE.get(path)
    if cached is not None:
        return cached
    try:
        import glob
        import os

        import pyarrow.parquet as pq

        parts = (
            sorted(glob.glob(os.path.join(path, "*.parquet")))
            if os.path.isdir(path)
            else [path]
        )
        n = sum(pq.ParquetFile(p).metadata.num_row_groups for p in parts)
    except Exception:
        # unreadable footer (missing pyarrow, transient read error):
        # report "plenty" so the remedy stays off for THIS call, but
        # do NOT cache the sentinel — a transient failure must not
        # permanently disarm the widening for the process lifetime
        # (ADVICE r20). Cached entries are keyed by path only; table
        # files are immutable within a session (the tests that rewrite
        # layouts poison the cache deliberately).
        return 1 << 30
    _ROW_GROUP_CACHE[path] = n
    return n


def _widen_intake(
    df: DataFrame, path: str, name: str, forced_key: str | None = None
) -> DataFrame:
    import os

    from ..session import default_parallelism

    key = forced_key or _INTAKE_KEYS.get(name)
    if key is None or os.environ.get("SPARK_GRAFT_INTAKE_WIDEN", "1") == "0":
        return df
    width = default_parallelism()
    if _row_groups(path) >= width:
        return df
    return df.repartition(width, key)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    widen_key: str | None = None,
    widen: bool = True,
) -> DataFrame:
    """Read one test table with its declared schema.

    ``widen_key`` opts a relational table into the intake respread for
    a query whose PRE-SHUFFLE map work is heavy (e.g. exact-percentile
    or sketch partial aggregation buffering every row) — A/B'd per
    call site, because for cheap-projection consumers the extra
    exchange is a net loss. Still layout-gated: a no-op whenever the
    file layout already provides enough row groups. ``widen=False``
    opts OUT for frames that are about to be BROADCAST — a respread
    under a broadcast build is pure overhead.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name in _NANOS_TS_COLS and _has_nanos_ts(path, _NANOS_TS_COLS[name]):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.schema(_RAW_SCHEMAS[name]).parquet(path)
        for c in _NANOS_TS_COLS[name]:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    else:
        df = spark.read.schema(SCHEMAS[name]).parquet(path)
    if not widen:
        return df
    return _widen_intake(df, path, name, widen_key)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views for the SQL API."""
    for n in names or TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
