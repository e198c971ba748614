"""Third-implementation checks for the r16 operators: the DuckDB
oracle and the Spark plan could share a misconception, so these
recompute results with an UNRELATED pure-Python reference on
engineered synthetic fixtures the oracle never sees — a page whose
every line is dropped (C4), a paragraph corpus where the FIRST
occurrence of the boilerplate sits mid-corpus, a Bloom filter
mirrored bit-for-bit in Python (plus the no-false-negative and
capacity-monotonicity properties), the CUSUM closed form pinned
against the sequential recursion it claims to equal, and an
equal-timestamp attribution collision where the max-event_id
tiebreak is the spec."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pyspark.sql import Row

from etl_xlsx_potgres_spark import registry
from etl_xlsx_potgres_spark.sources.tables import SCHEMAS

registry.load_all()


def _write(spark, tmp_path, name, rows):
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    spark.createDataFrame(rows, SCHEMAS[name]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")
    return str(tmp_path)


def _doc(doc_id, text, lang="en", source="web"):
    return Row(
        doc_id=doc_id, text=text, lang=lang, source=source,
        n_chars=len(text),
    )


# ----------------------------------------------------------------- C4


def _py_c4(doc_id: int, text: str):
    toks = [t for t in text.strip().lower().split() if t]
    lines = []
    n = (len(toks) + 7) // 8
    for i in range(1, n + 1):
        take = 3 if i % 5 == 0 else 8
        line = " ".join(toks[(i - 1) * 8:(i - 1) * 8 + take])
        if doc_id % 11 == 0 and i == 1:
            line += " lorem ipsum"
        if doc_id % 19 == 0 and i == 2:
            line += " javascript"
        if doc_id % 13 == 0 and i == 3:
            line += " {"
        if (doc_id + i) % 3 != 0:
            line += "."
        lines.append(line)
    kept = [
        l for l in lines
        if l[-1:] in ".!?\"" and len(l.split(" ")) >= 5
        and "javascript" not in l
    ]
    raw = "\n".join(lines)
    kt = "\n".join(kept)
    n_sent = sum(kt.count(c) for c in ".!?")
    return {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "n_sentences": n_sent,
        "kept_chars": len(kt),
        "has_lorem": "lorem ipsum" in raw,
        "has_brace": "{" in raw,
        "c4_keep": n_sent >= 3 and "lorem ipsum" not in raw
        and "{" not in raw,
    }


def test_c4_rules_match_python_reference(spark, tmp_path):
    # engineered: a 2-line page whose every line is dropped (doc 26
    # shape), a lorem page, a javascript page, a brace page, a clean
    # long page
    words = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731
    rows = [
        _doc(26, words(10)),    # 2 lines, both can drop
        _doc(11, words(40)),    # lorem seeded (11 % 11)
        _doc(19, words(40)),    # javascript line
        _doc(13, words(40)),    # brace page
        _doc(7, words(80)),     # clean keeper
        _doc(55, words(33)),    # 5 lines: short-line rule fires
    ]
    sf = _write(spark, tmp_path, "documents", rows)
    got = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["quality_c4_filters"](spark, sf).collect()
    }
    for row in rows:
        exp = _py_c4(row.doc_id, row.text)
        g = got[row.doc_id]
        for k, v in exp.items():
            assert g[k] == v, (row.doc_id, k, g[k], v)
    assert not got[26]["c4_keep"] and got[7]["c4_keep"]


# -------------------------------------------------- paragraph dedup


def test_paragraph_dedup_keep_first_matches_python(spark, tmp_path):
    B1 = "subscribe to our newsletter for the latest updates"
    words = lambda a, n: " ".join(f"t{a}_{i}" for i in range(n))  # noqa: E731
    # doc 6 and doc 12 both carry the boilerplate as para 1; doc 6 is
    # the earlier occurrence and must keep it, doc 12 must drop it
    rows = [
        _doc(5, words(5, 40)),
        _doc(6, words(6, 40)),
        _doc(12, words(12, 40)),
        _doc(13, words(13, 10)),
    ]
    sf = _write(spark, tmp_path, "documents", rows)
    got = {
        r["doc_id"]: r.asDict()
        for r in registry.QUERIES["dedup_paragraph_ccnet"](spark, sf).collect()
    }

    # python reference: rebuild paragraphs, keep-first by packed key
    paras = {}
    for row in rows:
        toks = row.text.split()
        n = (len(toks) + 15) // 16
        ps = []
        for i in range(1, n + 1):
            if row.doc_id % 6 == 0 and i == 1:
                ps.append(B1)
            elif row.doc_id % 9 == 0 and i == 2:
                ps.append(
                    f"all rights reserved by publisher family {row.doc_id % 3}"
                )
            else:
                ps.append(" ".join(toks[(i - 1) * 16:i * 16]))
        paras[row.doc_id] = ps
    first = {}
    for did in sorted(paras):
        for idx, p in enumerate(paras[did], start=1):
            first.setdefault(p, did * 1000000 + idx)
    for did, ps in paras.items():
        kept = [
            p for idx, p in enumerate(ps, start=1)
            if first[p] == did * 1000000 + idx
        ]
        kt = "\n".join(kept)
        g = got[did]
        assert g["n_paras"] == len(ps)
        assert g["n_kept"] == len(kept), (did, g["n_kept"], len(kept))
        assert g["kept_fp"] == hashlib.md5(kt.encode()).hexdigest()
    assert got[6]["n_kept"] == 3 and got[12]["n_kept"] == 2


# ----------------------------------------------------------- Bloom


def _py_bloom_pos(key: str, i: int, m_bits: int) -> int:
    h = hashlib.md5(f"{i}|{key}".encode()).hexdigest()
    hv = "0123456789abcdef".index
    return (256 * hv(h[0]) + 16 * hv(h[1]) + hv(h[2])) % m_bits


def test_bloom_matches_python_mirror(spark):
    from etl_xlsx_potgres_spark.plans.bloom_dedup import K_HASHES, M_BITS

    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["dedup_bloom_mergeable"](spark, sf).collect()
    assert rows

    # mirror the synthesis + filter in python
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    key = lambda d: (  # noqa: E731
        f"page-{(d // 10) * 7 % 509}" if d % 10 == 0 else f"page-{d % 150}"
    )
    corpus = {key(d) for d in ids if d % 10 != 0}
    bits = {
        _py_bloom_pos(k, i, M_BITS)
        for k in corpus for i in range(K_HASHES)
    }
    for r in rows:
        k = key(r["doc_id"])
        exp_hit = all(
            _py_bloom_pos(k, i, M_BITS) in bits for i in range(K_HASHES)
        )
        assert r["bloom_hit"] == exp_hit, r
        assert r["exact_hit"] == (k in corpus)
        assert not r["fn_violation"]


def test_bloom_capacity_monotonicity():
    # pure-python property: growing m can only remove false positives
    keys = [f"page-{i}" for i in range(150)]
    probes = [f"page-{i * 7 % 509}" for i in range(60)]
    fps = []
    for m in (256, 512, 1024, 4096):
        bits = {_py_bloom_pos(k, i, m) for k in keys for i in range(4)}
        fp = sum(
            1
            for p in probes
            if p not in keys
            and all(_py_bloom_pos(p, i, m) in bits for i in range(4))
        )
        fps.append(fp)
    assert fps == sorted(fps, reverse=True), fps
    assert fps[0] > fps[-1]  # undersized filter really is worse


# ----------------------------------------------------------- CUSUM


def test_cusum_closed_form_equals_sequential_recursion(spark, tmp_path):
    # synthetic: 20 days of level-50 counts, then signup jumps +20
    # (the seeded shift applies from Jan 20); python runs Page's
    # literal recursion, the engine claims the closed form
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for day in range(30):
        for typ in ("signup", "view"):
            for j in range(50 + (3 if day % 3 == 0 else 0)):
                rows.append(
                    Row(
                        event_id=eid,
                        ts=base + dt.timedelta(days=day, seconds=j),
                        user_id=j % 7,
                        event_type=typ,
                        value=1.0,
                        props="{}",
                    )
                )
                eid += 1
    sf = _write(spark, tmp_path, "events", rows)
    got = registry.QUERIES["ts_cusum_changepoint"](spark, sf).collect()
    by_type = {}
    for r in sorted(got, key=lambda r: (r["event_type"], r["day"])):
        by_type.setdefault(r["event_type"], []).append(r)

    for typ, series in by_type.items():
        cnts = [r["cnt"] for r in series]
        cal = cnts[:10]
        mu = sum(cal) * 1000000 // 10
        var = (10 * sum(c * c for c in cal) - sum(cal) ** 2) / 100
        sg = math.floor(math.sqrt(var) * 1000000)
        kap, h = sg // 2, 4 * sg
        sp = sn = 0
        for r, c in zip(series, cnts):
            sp = max(0, sp + c * 1000000 - mu - kap)
            sn = max(0, sn + mu - c * 1000000 - kap)
            assert r["s_pos_micro"] == sp, (typ, r["day"], r["s_pos_micro"], sp)
            assert r["s_neg_micro"] == sn
            assert r["alarm_up"] == (sp > h)
            assert r["alarm_down"] == (sn > h)
    # the seeded signup launch must alarm upward; view stays quiet
    assert any(r["alarm_up"] for r in by_type["signup"])
    assert not any(
        r["alarm_up"] or r["alarm_down"] for r in by_type["view"]
    )


# ----------------------------------------------- attribution edge


def test_attribution_equal_timestamp_tiebreak(spark, tmp_path):
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        # two marketing touches at the SAME timestamp: max event_id
        # (the view, id 2) must win the recovery join
        Row(event_id=1, ts=t0, user_id=1, event_type="click",
            value=0.0, props="{}"),
        Row(event_id=2, ts=t0, user_id=1, event_type="view",
            value=0.0, props="{}"),
        Row(event_id=3, ts=t0 + dt.timedelta(hours=1), user_id=1,
            event_type="purchase", value=9.5, props="{}"),
        # a stale touch outside the 7-day lookback -> direct
        Row(event_id=4, ts=t0, user_id=2, event_type="click",
            value=0.0, props="{}"),
        Row(event_id=5, ts=t0 + dt.timedelta(days=9), user_id=2,
            event_type="purchase", value=1.0, props="{}"),
        # no touch at all -> direct
        Row(event_id=6, ts=t0, user_id=3, event_type="purchase",
            value=2.0, props="{}"),
    ]
    sf = _write(spark, tmp_path, "events", rows)
    got = {
        r["event_id"]: r.asDict()
        for r in registry.QUERIES["events_attribution_last_touch"](
            spark, sf
        ).collect()
    }
    assert got[3]["attributed_type"] == "view"
    assert got[3]["touch_event_id"] == 2
    assert got[3]["lag_us"] == 3600 * 1000000
    assert got[5]["attributed_type"] == "direct"
    assert got[5]["touch_event_id"] is None
    assert got[6]["attributed_type"] == "direct"
