"""Third-implementation and negative-control checks for the r14
curation operators: the DuckDB oracle and the Spark plan could share
a misconception (same SQL idiom on both sides), so these tests
recompute outputs with an UNRELATED pure-Python reference on
synthetic fixtures the oracle never sees — including inputs outside
the shipped fixture's envelope (empty documents, identity
corruptions, engineered dist-0 collisions, hand-built drift).
"""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict
from datetime import datetime, timedelta

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_xlsx_potgres_spark import registry
from etl_xlsx_potgres_spark.sources.tables import SCHEMAS

registry.load_all()

SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
STOP = ("the", "and", "of", "to", "in", "is", "a", "that")


def _write(spark, tmp_path, name, rows):
    # micros, not INT96: load_table's nanos probe reads the arrow
    # metadata and INT96 presents as timestamp[ns]
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.createDataFrame(rows, SCHEMAS[name]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")
    return str(tmp_path)


def _doc(doc_id, text, lang="en", source="s0"):
    return Row(
        doc_id=doc_id, text=text, lang=lang, source=source,
        n_chars=len(text),
    )


def _synth_docs(n=400, seed=7):
    rng = random.Random(seed)
    words = ["the", "cat", "sat", "on", "mat", "of", "to", "zz", "qq"]
    rows = []
    for i in range(n):
        k = rng.choice([0, 1, 3, 17, 40, 90, 120])  # incl. empty docs
        text = " ".join(rng.choice(words) for _ in range(k))
        rows.append(_doc(i, text, lang=rng.choice(["en", "de", "zh"])))
    return rows


def _toks(text):
    return [t for t in text.lower().strip().split() if t]


def _shard(doc_id, mod=4):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[0], 16) % mod


# ---------------------------------------------------------------- batching


def test_pack_length_buckets_vs_python(spark, tmp_path):
    docs = _synth_docs()
    sf = _write(spark, tmp_path, "documents", docs)
    got = {
        (r.policy, r.length_bucket): r
        for r in registry.QUERIES["pack_length_buckets"](spark, sf).collect()
    }

    cells = defaultdict(list)  # (policy, bucket, shard) -> [(sortkey, n)]
    for d in docs:
        n = len(_toks(d.text))
        sh = _shard(d.doc_id)
        cells[("bucketed", min(n // 8, 15), sh)].append(((n, d.doc_id), n))
        cells[("naive", -1, sh)].append((d.doc_id, n))

    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, batches, real, padded
    for (policy, bucket, _), items in cells.items():
        items.sort(key=lambda x: x[0])
        lens = [n for _, n in items]
        for b in range(0, len(lens), 16):
            chunk = lens[b : b + 16]
            a = agg[(policy, bucket)]
            a[0] += len(chunk)
            a[1] += 1
            a[2] += sum(chunk)
            a[3] += len(chunk) * max(chunk)

    assert set(got) == set(agg)
    for key, (n_docs, n_batches, real, padded) in agg.items():
        r = got[key]
        assert (r.n_docs, r.n_batches, r.real_tokens, r.padded_tokens) == (
            n_docs, n_batches, real, padded,
        ), key
        assert r.waste_micro == ((padded - real) * 1_000_000) // max(padded, 1)


def test_pack_length_buckets_all_empty_bucket(spark, tmp_path):
    # a bucket whose every document is empty pads to 0 tokens — the
    # waste ratio must degrade to 0, not divide by zero
    sf = _write(spark, tmp_path, "documents", [_doc(i, "") for i in range(10)])
    rows = registry.QUERIES["pack_length_buckets"](spark, sf).collect()
    assert rows
    for r in rows:
        assert r.padded_tokens == 0 and r.waste_micro == 0


# ---------------------------------------------------------- token budget


def test_select_token_budget_vs_python(spark, tmp_path):
    docs = _synth_docs(seed=11)
    sf = _write(spark, tmp_path, "documents", docs)
    got = {
        r.quality_bin: r
        for r in registry.QUERIES["select_token_budget"](spark, sf).collect()
    }

    bins = defaultdict(lambda: [0, 0])
    for d in docs:
        toks = _toks(d.text)
        n = len(toks)
        score = (sum(t in STOP for t in toks) * 1_000_000) // max(n, 1)
        b = bins[score // 10_000]
        b[0] += 1
        b[1] += n
    total = sum(t for _, t in bins.values())
    budget = (total * 3) // 10

    cum = 0
    assert set(got) == set(bins)
    for qbin in sorted(bins, reverse=True):
        n_docs, toks = bins[qbin]
        cum += toks
        r = got[qbin]
        assert (r.n_docs, r.bin_tokens, r.cum_tokens) == (n_docs, toks, cum)
        assert r.budget_tokens == budget
        assert r.fully_selected == (cum <= budget)
        assert r.is_boundary == (cum > budget and cum - toks <= budget)
    # exactly one boundary bin unless everything fits
    assert sum(r.is_boundary for r in got.values()) <= 1


# ------------------------------------------------------------- ccnet gate


def test_quality_ccnet_gate_vs_python(spark, tmp_path):
    docs = _synth_docs(seed=13)
    sf = _write(spark, tmp_path, "documents", docs)
    got = {
        (r.lang, r.band): r
        for r in registry.QUERIES["quality_ccnet_gate"](spark, sf).collect()
    }

    hist = defaultdict(lambda: [0, 0])  # (lang, bin) -> [docs, tokens]
    for d in docs:
        toks = _toks(d.text)
        n = len(toks)
        score = 1_000_000 - (len(set(toks)) * 1_000_000) // max(n, 1)
        h = hist[(d.lang, score // 10_000)]
        h[0] += 1
        h[1] += n

    ref = defaultdict(lambda: [0, 0, 0, None, None])
    for lang in {k[0] for k in hist}:
        items = sorted((b, v) for (lg, b), v in hist.items() if lg == lang)
        n_lang = sum(v[0] for _, v in items)
        cum = 0
        for b, (nd, nt) in items:
            cum += nd
            band = (
                "head" if 10 * cum <= 3 * n_lang
                else "middle" if 10 * cum <= 7 * n_lang
                else "tail"
            )
            r = ref[(lang, band)]
            r[0] += nd
            r[1] += nt
            r[2] += 1
            r[3] = b if r[3] is None else min(r[3], b)
            r[4] = b if r[4] is None else max(r[4], b)

    assert set(got) == set(ref)
    for key, (nd, nt, nb, mn, mx) in ref.items():
        r = got[key]
        assert (r.n_docs, r.total_tokens, r.n_bins, r.min_bin, r.max_bin) == (
            nd, nt, nb, mn, mx,
        ), key
    # per language the bands partition the population
    for lang in {k[0] for k in ref}:
        assert sum(r[0] for k, r in ref.items() if k[0] == lang) == sum(
            got[k].n_docs for k in got if k[0] == lang
        )


# ---------------------------------------------------------------- linkage


def _cust(key, name, nation=3, bal=100.0, seg="BUILDING"):
    return Row(
        c_custkey=key, c_name=name, c_nationkey=nation,
        c_acctbal=bal, c_mktsegment=seg,
    )


def test_linkage_identity_corruption_all_correct(spark, tmp_path):
    # keys like 10000, 20000… have '0' at every transposable position:
    # the corruption is the identity, so every record must self-match
    # at dist 0, correct, regardless of nation/segment layout
    rows = [
        _cust(i * 10_000, f"Customer#{i * 10_000:09d}",
              nation=i % 4, bal=float(i), seg=SEGS[i % 5])
        for i in range(1, 21)
    ]
    sf = _write(spark, tmp_path, "customer", rows)
    got = registry.QUERIES["linkage_blocked_match"](spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.match_dist, r.is_correct, r.n_records) == (0, True, 20)
    assert r.dirty_key_sum == r.matched_key_sum == sum(
        i * 10_000 for i in range(1, 21)
    )


def test_linkage_engineered_collision_surfaces_as_incorrect(spark, tmp_path):
    # 410 % 3 == 2 -> p=8: dirty(410) == clean(401) and vice versa —
    # a mutual dist-0 collision that MUST beat the dist-2 truth and be
    # reported as incorrect, never silently counted as linked-ok
    rows = [
        _cust(410, "Customer#000000410"),
        _cust(401, "Customer#000000401"),
        # same block, far key: must not perturb the argmin
        _cust(409, "Customer#000000409"),
    ]
    sf = _write(spark, tmp_path, "customer", rows)
    got = {
        (r.match_dist, r.is_correct): r
        for r in registry.QUERIES["linkage_blocked_match"](spark, sf).collect()
    }
    bad = got[(0, False)]
    assert bad.n_records == 2
    assert bad.dirty_key_sum == 811 and bad.matched_key_sum == 811
    # 409 % 3 == 1 -> p=7 swaps '4' and '0' -> dirty 000000049…? no:
    # digits 000000409, p=7 swaps pos7/8 ('4','0') -> 000000049 — no
    # dist<=1 neighbor exists, so its best match is itself at dist 2
    ok = got[(2, True)]
    assert ok.n_records == 1 and ok.dirty_key_sum == 409


# ------------------------------------------------------------------ drift


def test_drift_tv_known_histograms(spark, tmp_path):
    # week0 and week1 share a 50/50 split across bins 0 and 2 -> TV 0;
    # week2 concentrates everything in bin 2 -> TV = 500000, drifted
    base = datetime(2024, 1, 1)
    rows, eid = [], 0

    def emit(week, value, n):
        nonlocal eid
        for i in range(n):
            rows.append(Row(
                event_id=eid, ts=base + timedelta(days=7 * week, minutes=i),
                user_id=1, event_type="click", value=value, props="{}",
            ))
            eid += 1

    emit(0, 1.0, 10); emit(0, 5.0, 10)
    emit(1, 1.0, 10); emit(1, 5.0, 10)
    emit(2, 5.0, 20)
    sf = _write(spark, tmp_path, "events", rows)
    got = {
        r.week: r
        for r in registry.QUERIES["drift_weekly_value_hist"](spark, sf).collect()
    }
    assert set(got) == {1, 2}
    assert (got[1].tv_micro, got[1].drifted) == (0, False)
    assert (got[2].tv_micro, got[2].drifted) == (500_000, True)
    assert (got[2].n_curr, got[2].n_prev) == (20, 20)
