"""Language-ID confusion matrix — the accuracy audit for the
heuristic identifier (the same discipline as ``quality_nb_confusion``
for the NB gate, ``ann_recall_eval`` for the IVF index, and
``dedup_minhash_calibration`` for the signature screen: every
classifier in the curation path ships with its confusion rollup,
because a curation run routes documents BY predicted language and a
silent identifier regression poisons every per-language stage
downstream — CCNet's pipeline is language-keyed from the first
split).

Reuses the registered ``text_lang_id`` plan verbatim (same markers,
same tiebreak cascade), so a change to the identifier shows up here
as a rate shift, hash-checked.  Rates are exact integer
micro-fractions (``n * 1e6 DIV label_total`` — non-negative, so
DuckDB ``//`` truncation == Spark ``DIV``); no float enters the pair.

Plan shape: the per-doc prediction pass is the identifier's own
map-only projection; this adds ONE (label, predicted) aggregate
(25-cell frame at any corpus size, map-side partials) and a
label-total window over that constant frame.

r16 history: this audit originally exposed a DEGENERATE identifier —
the raw synthetic text carries no marker words, so every document
fell through the cascade to 'en' (recall 1.0 for en, 0.0 elsewhere).
r17 made the fixture non-trivial via the deterministic in-query
localization in ``text_analysis`` (label-seeded marker injection with
genuine cross-language collisions — 'des', 'la', 'de'); the matrix
now has ≥3 predicted classes, a strong diagonal, and honest
off-diagonal mass (de→fr, fr→es, low-signal→en), so an identifier
regression moves hash-checked rates instead of hiding behind a
constant column.

Reference lifecycle note: the reference (etl_process.py:1-235) has no
classifier surface; identifier auditing is north-star curation
machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import ORACLES, register
from . import text_analysis  # noqa: F401  (registers text_lang_id first)
from .text_analysis import text_lang_id


@register(
    "text_lang_confusion",
    oracle=f"""
    WITH preds AS ({ORACLES["text_lang_id"]}),
    cells AS (
      SELECT labeled_lang, predicted_lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM preds GROUP BY 1, 2
    )
    SELECT labeled_lang, predicted_lang, n_docs,
           CAST(SUM(n_docs) OVER (PARTITION BY labeled_lang) AS BIGINT)
             AS label_total,
           CAST(n_docs * 1000000
                // SUM(n_docs) OVER (PARTITION BY labeled_lang)
                AS BIGINT) AS rate_micro,
           labeled_lang = predicted_lang AS is_correct
    FROM cells
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    preds = text_lang_id(spark, sf_dir)
    cells = preds.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy("labeled_lang")
    return cells.select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        F.sum("n_docs").over(w).cast("long").alias("label_total"),
        F.expr(
            "CAST(n_docs * 1000000 DIV SUM(n_docs)"
            " OVER (PARTITION BY labeled_lang) AS BIGINT)"
        ).alias("rate_micro"),
        (F.col("labeled_lang") == F.col("predicted_lang")).alias(
            "is_correct"
        ),
    )
