"""The Arrow token counter (``text_tokcount_arrow``) claims bit-exact
parity with its DuckDB oracle
``len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''))``.
The fixture's single-line ASCII text can't falsify that claim on the
characters where the engines actually disagree: DuckDB's trim() strips
exactly the Unicode Zs category (\\xa0, \\u3000, ...) but NOT
\\t/\\x0b/\\f/\\u2028; Arrow's utf8_trim_whitespace strips all of them.
This test feeds ``_count_batches`` the adversarial strings directly and
compares against the oracle expression running in DuckDB."""

from __future__ import annotations

import duckdb
import pyarrow as pa

from etl_xlsx_potgres_spark.plans.arrow_ops import _count_batches

_ADVERSARIAL = [
    "\xa0 a",               # Zs lead: oracle trims the \xa0 -> 1 token
    "a\t",                  # trailing tab: NOT trimmed by either engine
    "a\x0b b",              # \x0b is NOT in RE2's \s -> glued to 'a'
    "a\x0bb",
    " a ",
    "\x0ba",
    "a\fb",
    "a\rb",
    "a\nb",
    "",
    "\xa0",                 # Zs-only doc -> trims to empty -> 0 tokens
    "\u3000ideographic\u3000",
    "\u2028line sep",  # U+2028 is neither Zs-trimmed nor RE2 \\s
    "a\x1cb",
    "  double  spaced  ",
    "\t\n mixed \r\n ws \t",
    "plain ascii words",
]


def test_arrow_counter_matches_duckdb_oracle_on_adversarial_text():
    batch = pa.record_batch(
        [
            pa.array(list(range(len(_ADVERSARIAL))), type=pa.int64()),
            pa.array(_ADVERSARIAL, type=pa.string()),
        ],
        names=["doc_id", "text"],
    )
    got = {}
    for out in _count_batches([batch]):
        for row in out.to_pylist():
            got[row["doc_id"]] = (row["n_chars"], row["n_tokens"])

    con = duckdb.connect()
    for i, text in enumerate(_ADVERSARIAL):
        n_chars, n_tokens = con.execute(
            "SELECT CAST(len(?) AS BIGINT),"
            " CAST(len(list_filter(string_split_regex(trim(lower(?)),"
            " '\\s+'), x -> x <> '')) AS BIGINT)",
            [text, text],
        ).fetchone()
        assert got[i] == (n_chars, n_tokens), (
            f"doc {i} {text!r}: arrow={got[i]}"
            f" oracle=({n_chars}, {n_tokens})"
        )
