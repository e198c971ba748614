"""The URL canonicalizer's Spark side (native parse_url) and oracle
side (portable regexes) claim identical semantics; the registered
fixture only exercises the four synthesized shapes.  This test feeds
both expressions the edge URLs where a divergence would actually
hide: query-less URLs (parse_url QUERY is NULL — an uncoalesced NULL
would null the whole canonical string), non-default ports (must
SURVIVE — a different origin), default ports on the wrong scheme
(http://x:443 is non-default, keep it), utm-only queries (canonical
has no '?'), params merely PREFIXED utm-like ('utmx=1' must stay),
and empty paths."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from etl_xlsx_potgres_spark.plans.url_dedup import _DUCK_CANON, _SPARK_CANON

_EDGE_URLS = [
    "https://plain.example.com/a/b",            # no query at all
    "https://Host.Example.com:443/a?id=1",      # default port stripped
    "http://host.example.com:80/a?id=1",        # default port stripped
    "http://host.example.com:443/a?id=1",       # NON-default for http
    "https://host.example.com:8080/a?id=1",     # non-default survives
    "https://x.com/a?utm_source=1&utm_medium=2",  # utm-only -> no '?'
    "https://x.com/a?utmx=1",                   # prefix-similar, kept
    "HTTPS://UPPER.COM/Path?id=9#frag",         # case + fragment
    "https://x.com",                            # empty path, no query
    "https://x.com:443",                        # empty path + default port
    "https://x.com/a?id=1&utm_a=2&z=3",         # utm mid-query
    "https://x.com/a?z=3&id=1",                 # reordered -> sorted
    "https://x.com/a?UTM_Source=x&id=1",        # case-folded utm strip
    "https://x.com/a?Z=3&a=1",                  # binary sort: 'Z' < 'a'
]


def test_spark_and_oracle_canonicalize_identically(spark):
    df = spark.createDataFrame([(u,) for u in _EDGE_URLS], "url string")
    got = {
        r["url"]: r["canon"]
        for r in df.select(
            "url", F.expr(_SPARK_CANON).alias("canon")
        ).collect()
    }
    con = duckdb.connect()
    for u in _EDGE_URLS:
        want = con.execute(
            f"SELECT {_DUCK_CANON} FROM (SELECT ? AS url)", [u]
        ).fetchone()[0]
        assert got[u] == want, f"{u!r}: spark={got[u]!r} oracle={want!r}"
    # spot-check the semantics themselves, not just parity
    assert got["https://plain.example.com/a/b"] == (
        "https://plain.example.com/a/b"
    )
    assert got["https://Host.Example.com:443/a?id=1"] == (
        "https://host.example.com/a?id=1"
    )
    assert got["https://host.example.com:8080/a?id=1"] == (
        "https://host.example.com:8080/a?id=1"
    )
    assert got["http://host.example.com:443/a?id=1"] == (
        "http://host.example.com:443/a?id=1"
    )
    assert got["https://x.com/a?utm_source=1&utm_medium=2"] == (
        "https://x.com/a"
    )
    assert got["https://x.com/a?utmx=1"] == "https://x.com/a?utmx=1"
    assert got["https://x.com/a?id=1&utm_a=2&z=3"] == (
        "https://x.com/a?id=1&z=3"
    )
    assert got["https://x.com/a?z=3&id=1"] == "https://x.com/a?id=1&z=3"
    assert got["https://x.com/a?UTM_Source=x&id=1"] == "https://x.com/a?id=1"
    assert got["https://x.com/a?Z=3&a=1"] == "https://x.com/a?Z=3&a=1"
