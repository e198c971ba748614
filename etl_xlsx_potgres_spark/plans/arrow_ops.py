"""``mapInArrow`` — the lowest-overhead Python escape hatch (Spark
3.3+, first-class in Spark 4): the UDF receives raw
``pyarrow.RecordBatch`` objects with NO pandas conversion on either
side, the right shape when the Python work is itself Arrow-native
(pyarrow.compute kernels, Arrow-IPC-speaking libraries, zero-copy
hand-off to tokenizers). Completes the Python-boundary matrix the
engine exercises: row Python UDF (banned by plan lint), pandas UDF,
mapInPandas, cogrouped/grouped pandas, UDTF (``chunk_udtf``), and now
raw-Arrow batches.

The demo computes per-document char/token counts entirely with
pyarrow.compute kernels (``utf8_length``; token count =
whitespace-run count + 1 on the trimmed string — exactly the
filtered-split tokenizer's count, including the empty-string -> 0
case). Map-only: no shuffle, the batch iterator streams, and column
pruning still reaches the scan (only doc_id/text are read —
mapInArrow declares its input like any projection).

Counts are exact integers, so the DuckDB oracle is bit-exact — the
same pinning discipline as ``text_chunk_udtf``: the Arrow kernel
implementation must agree with the declarative tokenizer everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .importance_sampling import _DUCK_TOKS


# DuckDB's default trim() strips exactly the Unicode Zs (space
# separator) category — probed char-by-char against duckdb 1.x: it
# does NOT touch \t \n \x0b \f \r     \x85.  Arrow's
# utf8_trim_whitespace strips MORE (all Unicode whitespace incl.
# \t/\x0b/ ), which diverges from the oracle on text like
# '\xa0 a' (oracle: 1 token after trimming the \xa0; old impl: 1 by
# luck, but 'a\x0b b' style inputs split differently).  Mirror the
# oracle instead: Zs-only trim, then count maximal runs of
# non-RE2-\s chars ([\t\n\f\r ] — RE2's ASCII \s, which both Arrow
# and DuckDB regexes use).  Run-count == token count directly: no
# +1/empty-string special case.
_ZS_CHARS = "".join(
    map(
        chr,
        [0x20, 0xA0, 0x1680, *range(0x2000, 0x200B), 0x202F, 0x205F, 0x3000],
    )
)


def _count_batches(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column(1)
        trimmed = pc.utf8_trim(text, _ZS_CHARS)
        n_tokens = pc.count_substring_regex(trimmed, "[^\t\n\f\r ]+")
        yield pa.record_batch(
            [
                batch.column(0),
                pc.cast(pc.utf8_length(text), pa.int64()),
                pc.cast(n_tokens, pa.int64()),
            ],
            names=["doc_id", "n_chars", "n_tokens"],
        )


@register(
    "text_tokcount_arrow",
    oracle=f"""
    SELECT doc_id,
           CAST(len(text) AS BIGINT) AS n_chars,
           CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def text_tokcount_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        _count_batches, "doc_id long, n_chars long, n_tokens long"
    )
