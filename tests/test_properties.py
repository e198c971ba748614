"""Hypothesis property tests for the scalar cleaning/text operators:
the invariants hold for arbitrary inputs, not just fixture values.
Each property is evaluated through Spark itself (one batched
createDataFrame per example set, not per example, to keep runtime
sane)."""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_xlsx_potgres_spark.operators.clean import (
    digits_only,
    normalize_header,
    phone_normalize,
)
from etl_xlsx_potgres_spark.operators.text import normalize_text, token_count

TEXTS = st.text(min_size=0, max_size=60)


def _apply(spark, values: list[str], col_fn) -> list:
    pdf = pd.DataFrame({"v": pd.Series(values, dtype="object")})
    df = spark.createDataFrame(pdf, schema="v string")
    return [r.out for r in df.select(col_fn("v").alias("out")).collect()]


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_digits_only_strips_all_nondigits(spark, values):
    # contract: ASCII digits (Java/RE2 \d semantics); Python's unicode
    # \d would additionally keep exotic digit codepoints like U+16A60
    for inp, out in zip(values, _apply(spark, values, digits_only)):
        assert out == re.sub(r"[^0-9]", "", inp)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_phone_normalize_idempotent(spark, values):
    once = _apply(spark, values, phone_normalize)
    twice = _apply(spark, once, phone_normalize)
    assert once == twice
    # contract: ASCII-\s edge strip (Java/RE2 semantics; Python's
    # str.strip()/unicode-\s also cover \x1c-\x1f, \xa0 — excluded)
    ascii_ws = " \t\n\r\x0b\x0c"
    for o in once:
        assert "+" not in o and "-" not in o and o == o.strip(ascii_ws)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_normalize_text_canonical(spark, values):
    """Normalization is idempotent and produces only [a-z0-9 ] with
    single spaces."""
    once = _apply(spark, values, normalize_text)
    twice = _apply(spark, once, normalize_text)
    assert once == twice
    for o in once:
        assert re.fullmatch(r"([a-z0-9]+( [a-z0-9]+)*)?", o), repr(o)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_token_count_matches_regex_contract(spark, values):
    """The operator's contract is regex \\s tokenization (ASCII
    whitespace — what the DuckDB oracle computes too), which differs
    from Python str.split() on exotic controls like \\x1c."""
    for inp, out in zip(values, _apply(spark, values, token_count)):
        expected = len(
            [t for t in re.split(r"[ \t\n\r\f\v]+", inp.lower()) if t != ""]
        )
        assert out == expected


@given(st.text(min_size=0, max_size=40))
def test_normalize_header_no_forbidden_chars(name):
    out = normalize_header(name)
    assert "." not in out and "/" not in out and " " not in out
