"""Third-implementation checks for r8c operators: the DuckDB oracle
and the Spark plan could in principle share a misconception; these
tests recompute outputs with an UNRELATED Python implementation
(urllib.parse, json, hashlib, collections) and require exact
agreement on real fixture rows."""

from __future__ import annotations

import hashlib
import json
import math
from collections import Counter

from pyspark.sql import functions as F

from etl_xlsx_potgres_spark import registry

registry.load_all()

SAMPLE = 50


def test_url_pack_vs_urllib(spark, sf_dir):
    from urllib.parse import parse_qs, urlsplit

    rows = (
        registry.QUERIES["fn_url_pack"](spark, sf_dir)
        .orderBy("o_orderkey")
        .limit(SAMPLE)
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        s = urlsplit(r.url)
        q = parse_qs(s.query)
        assert r.scheme == s.scheme
        assert r.host == s.hostname
        assert r.path == s.path
        assert r.query == s.query
        assert r.param_id == q["id"][0]
        assert r.param_p == q["p"][0]
        assert r.registered_domain == ".".join(s.hostname.split(".")[-2:])


def test_variant_pack_vs_json(spark, sf_dir):
    from etl_xlsx_potgres_spark.sources import load_table

    out = {
        r.event_id: r
        for r in registry.QUERIES["fn_variant_pack"](spark, sf_dir)
        .orderBy("event_id")
        .limit(SAMPLE)
        .collect()
    }
    raw = {
        r.event_id: r
        for r in load_table(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(SAMPLE)
        .collect()
    }
    assert set(out) == set(raw)
    for eid, r in out.items():
        e = raw[eid]
        assert r.props_k == json.loads(e.props)["k"]
        assert r.v_type == e.event_type
        assert r.v_floor == math.floor(e.value)
        assert r.v_user == e.user_id
        assert r.v_tag0 == f"{e.event_type}:{e.user_id}"


def test_char_entropy_vs_python(spark, sf_dir):
    from etl_xlsx_potgres_spark.sources import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(SAMPLE)
        .collect()
    }
    out = (
        registry.QUERIES["text_char_entropy"](spark, sf_dir)
        .filter(F.col("doc_id").isin(list(docs)))
        .collect()
    )
    assert len(out) == len(docs)
    for r in out:
        tl = (docs[r.doc_id] or "").lower()
        buckets = Counter()
        for ch in tl:
            if "a" <= ch <= "z":
                buckets[ch] += 1
            elif ch.isdigit() and ch.isascii():
                buckets["digit"] += 1
            elif ch in " \t\n\r":
                buckets["space"] += 1
            else:
                buckets["other"] += 1
        total = max(len(tl), 1)
        ent = -sum(
            (c / total) * math.log2(c / total) for c in buckets.values()
        )
        assert r.n_chars == len(tl)
        assert r.n_letters == sum(
            v for k, v in buckets.items() if len(k) == 1 and k.isalpha()
        )
        assert r.n_digits == buckets["digit"]
        assert r.n_spaces == buckets["space"]
        assert r.n_other == buckets["other"]
        assert abs(r.char_entropy - ent) < 1e-3  # query rounds to 4 dp (r11)


def test_encode_ids_digest_vs_python(spark, sf_dir):
    """Recompute the id-sequence digest from scratch: tokenize, learn
    the same top-K vocab (count desc, term asc), encode, md5."""
    from etl_xlsx_potgres_spark.plans.tokenizer_apply import VOCAB_K
    from etl_xlsx_potgres_spark.sources import load_table

    docs = {
        r.doc_id: (r.text or "").lower().strip().split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    counts = Counter(t for toks in docs.values() for t in toks)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]
    vocab = {t: i + 1 for i, (t, _) in enumerate(ranked)}
    out = registry.QUERIES["text_encode_ids"](spark, sf_dir).collect()
    checked = 0
    for r in out[:SAMPLE]:
        toks = docs[r.doc_id]
        if not toks:
            continue
        ids = [vocab.get(t, 0) for t in toks]
        digest = hashlib.md5(
            ",".join(str(i) for i in ids).encode()
        ).hexdigest()
        assert r.n_tokens == len(ids)
        assert r.n_oov == sum(1 for i in ids if i == 0)
        assert r.ids_digest == digest
        assert r.first_id == ids[0]
        checked += 1
    assert checked > 0


def test_bigram_logprob_vs_python(spark, sf_dir):
    """Recompute sum_lp_micro for sampled docs with plain Python
    floats + math.floor — must agree exactly (the floor grid is the
    contract)."""
    from etl_xlsx_potgres_spark.sources import load_table

    docs = {
        r.doc_id: (r.text or "").lower().strip().split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    cu = Counter(t for toks in docs.values() for t in toks)
    cb = Counter(
        (a, b)
        for toks in docs.values()
        for a, b in zip(toks, toks[1:])
    )
    v = len(cu)
    out = registry.QUERIES["text_bigram_logprob"](spark, sf_dir).collect()
    checked = 0
    for r in out[:SAMPLE]:
        toks = docs[r.doc_id]
        bigrams = list(zip(toks, toks[1:]))
        if not bigrams:
            continue
        s = sum(
            math.floor(math.log((cb[bg] + 1) / (cu[bg[0]] + v)) * 1000000)
            for bg in bigrams
        )
        assert r.n_bigrams == len(bigrams)
        assert r.sum_lp_micro == s
        checked += 1
    assert checked > 0
