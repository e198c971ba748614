"""Edge-fixture differential test for the corpus operators: the
shipped fixtures contain no empty or NULL documents, so the
sequence(0,-1)-counts-down and size(NULL)=-1 cross-engine divergences
would stay invisible until a fixture regeneration. This test builds a
tiny documents table that HAS those edges and re-runs the
query-vs-oracle comparison on it."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from etl_xlsx_potgres_spark import registry

from .oracle_utils import assert_frames_match

registry.load_all()

NAMES = [
    "dedup_corpus_segments",
    "text_bm25_search",
    "text_unigram_logprob",
    "text_bpe_pair_counts",
    "text_inverted_index",
    # r8c corpus operators: the same empty/whitespace/NULL edges
    "text_char_entropy",
    "dedup_substring_windows",
    "text_encode_ids",
    "text_bigram_logprob",
    "agg_countmin_heavy_hitters",
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    rows = [
        # normal docs (with the BM25 terms so that query is non-vacuous)
        (0, "spark join dup table row value spark join window table", "en", "src0"),
        (1, "join window value spark dup dup row row row scan filter agg", "en", "src1"),
        (2, "spark join dup table row value spark join window table", "en", "src0"),
        # the edges: empty text, whitespace-only text, NULL text
        (3, "", "en", "src2"),
        (4, "   ", "en", "src2"),
        (5, None, "en", "src2"),
        # single short token (BPE pair guard: len(w) < 2)
        (6, "a", "en", "src0"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].map(lambda t: len(t) if isinstance(t, str) else 0)
    pdf = pdf.astype({"doc_id": "int64", "n_chars": "int64"})
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.mark.parametrize("name", NAMES)
def test_edge_fixture_matches_oracle(name, spark, edge_sf_dir):
    sdf = registry.QUERIES[name](spark, edge_sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{edge_sf_dir}/documents.parquet'"
    )
    odf = con.sql(registry.ORACLES[name]).fetchdf()
    con.close()
    assert len(sdf) > 0, f"{name}: vacuous on the edge fixture"
    assert_frames_match(sdf, odf, f"{name}@edge")
