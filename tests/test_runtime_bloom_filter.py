"""Runtime bloom-filter join pruning (`InjectRuntimeFilter`): the
row-level sibling of dynamic partition pruning (`tests/test_dpp.py`).
DPP eliminates whole partitions of a PARTITIONED fact; the bloom
filter covers the other 100 TB case — an UNPARTITIONED (or
wrong-key-partitioned) fact shuffle-joined to a selectively-filtered
dim. Spark builds a `bloom_filter_agg` over the dim's join keys and
injects a `might_contain` filter into the fact scan, so most fact
rows die at the scan instead of travelling through the shuffle.

Thresholds are lowered to fixture scale (the defaults — creation side
<= 10 MB, application side >= 10 GB scanned — are 100 TB numbers);
asserted is the mechanism: injection into the plan, and
value-equality with the un-filtered join.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from etl_xlsx_potgres_spark.sources import load_table

_CONF = {
    # the fact side would broadcast the filtered dim at fixture scale,
    # and a broadcast join never needs (or gets) a bloom filter —
    # force the shuffle join shape the feature exists for
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # fixture-scale: the lineitem scan (~150 KB at sf0.001) must
    # qualify as "big enough to be worth filtering"
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10KB",
}


@contextlib.contextmanager
def _conf(spark, kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _join(spark, sf_dir):
    """lineitem shuffle-joined to a selectively-filtered orders side:
    the canonical injection shape (selective dim, big fact)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    return li.join(o, li.l_orderkey == o.o_orderkey)


def test_bloom_filter_injected_into_fact_side(spark, sf_dir):
    with _conf(spark, _CONF):
        df = _join(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    assert "might_contain" in plan, (
        f"no bloom-filter runtime filter in the plan:\n{plan[:2500]}"
    )
    assert "bloom_filter_agg" in plan


def test_bloom_filtered_join_value_correct(spark, sf_dir):
    """The bloom filter is a MAY-contain pre-filter (false positives
    die in the real join) — results must be exactly the plain join's."""
    plain = sorted(
        (r["l_orderkey"], r["l_extendedprice"])
        for r in _join(spark, sf_dir).collect()
    )
    assert plain, "fixture has no urgent orders — vacuous"
    with _conf(spark, _CONF):
        filtered = sorted(
            (r["l_orderkey"], r["l_extendedprice"])
            for r in _join(spark, sf_dir).collect()
        )
    assert filtered == plain
