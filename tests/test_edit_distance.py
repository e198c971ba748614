"""Property test: pigeonhole segment blocking finds EVERY pair with
levenshtein <= k on non-degenerate synthetic data (vs brute force)."""

from __future__ import annotations

import random

import duckdb
import pytest

from etl_xlsx_potgres_spark.operators.edit_distance import (
    levenshtein_pairs_blocked,
)

ALPHABET = "abcdef"


def _mutate(rng: random.Random, s: str, n_edits: int) -> str:
    for _ in range(n_edits):
        op = rng.choice(("sub", "ins", "del"))
        if op == "del" and len(s) > 1:
            i = rng.randrange(len(s))
            s = s[:i] + s[i + 1 :]
        elif op == "ins":
            i = rng.randrange(len(s) + 1)
            s = s[:i] + rng.choice(ALPHABET) + s[i:]
        else:
            i = rng.randrange(len(s))
            s = s[:i] + rng.choice(ALPHABET) + s[i + 1 :]
    return s


def _corpus(seed: int, n_base: int = 80) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n_base):
        base = "".join(
            rng.choice(ALPHABET) for _ in range(rng.randint(4, 15))
        )
        out.append(base)
        out.append(_mutate(rng, base, rng.randint(0, 2)))  # near-dup
        out.append(_mutate(rng, base, rng.randint(3, 6)))  # decoy
    return out


def _brute_pairs(strings: list[str], k: int) -> set[tuple[int, int, int]]:
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(strings)))
    rows = con.sql(
        f"""SELECT a.id, b.id, levenshtein(a.s, b.s) FROM t a JOIN t b
            ON a.id < b.id WHERE levenshtein(a.s, b.s) <= {k}"""
    ).fetchall()
    return {(int(a), int(b), int(d)) for a, b, d in rows}


@pytest.mark.parametrize("seed,k", [(7, 1), (11, 2), (13, 3)])
def test_blocked_pairs_equal_brute_force(spark, seed, k):
    strings = _corpus(seed)
    df = spark.createDataFrame(
        list(enumerate(strings)), schema="id long, s string"
    )
    got = {
        (int(r.d1), int(r.d2), int(r.dist))
        for r in levenshtein_pairs_blocked(df, "id", "s", k).collect()
    }
    want = _brute_pairs(strings, k)
    missing = want - got
    extra = got - want
    assert not missing, f"missed {len(missing)} true pairs, e.g. {sorted(missing)[:5]}"
    assert not extra, f"emitted {len(extra)} false pairs, e.g. {sorted(extra)[:5]}"


def test_blocked_pairs_handle_strings_shorter_than_k_plus_1(spark):
    strings = ["a", "b", "ab", "", "ba", "abc"]
    df = spark.createDataFrame(
        list(enumerate(strings)), schema="id long, s string"
    )
    got = {
        (int(r.d1), int(r.d2), int(r.dist))
        for r in levenshtein_pairs_blocked(df, "id", "s", 2).collect()
    }
    want = _brute_pairs(strings, 2)
    assert got == want
