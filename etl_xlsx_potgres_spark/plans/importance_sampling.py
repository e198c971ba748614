"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling")
— select raw documents whose hashed-n-gram profile looks like a
target distribution.

Public method, re-expressed Spark-first:

1. featurize every document as hashed n-gram counts — unigrams plus
   word bigrams, md5-bucketed into ``B`` buckets (the paper's
   10k-bucket hash shrunk to fixture scale; md5 keeps the bucket
   function byte-identical in the DuckDB oracle);
2. fit two bag-of-hashed-ngrams multinomials with add-one smoothing:
   the *target* (here: ``lang = 'en'`` documents, standing in for the
   paper's formal-text target) and the *raw* corpus;
3. per-document log importance weight
   ``log w(x) = sum_b c_b(x) * (log p_target[b] - log p_raw[b])``;
4. select: top-k by weight with a deterministic tiebreak (the
   paper's Gumbel top-k resampling minus the noise term, which would
   not be oracle-reproducible).

Numeric policy: per-bucket log-ratios floor to integer micro-nats
(the ``text_bigram_logprob`` grid) so every per-document aggregate is
an exact bigint sum — order-independent on both engines. The ratio is
formed with each smoothed count LIFTED TO DOUBLE before the
multiply: exact (hence oracle-bit-identical) while every factor is
below 2^53, and overflow-proof at 100 TB where the old bigint
products (~count x corpus_total) would wrap int64 — the r14 verdict's
headroom caveat, now the tested path (tests/test_double_lift.py).

Plan shape: ONE tokenize+featurize pass over ``documents`` (grams are
built as a per-row array — unigrams ``concat`` a ``zip_with`` bigram
array — so no per-doc window is needed), one shuffle to per-(doc,
bucket) counts, which single persisted frame feeds the raw model, the
target model, AND the final weight join. The bucket model (``lp``,
<= B rows by construction) and the 1-row totals (``tot``) are the
only broadcasts — both constant-size at any corpus scale; the
corpus-sized count frame is equi-joined on ``bucket``. The top-k
variant is a ``TakeOrderedAndProject`` (per-partition heaps + driver
merge of k), never a global sort.

Reference lifecycle note: the reference has no corpus stage
(``etl_process.py:1-235``); this extends the driver-mandated
LLM-curation pack alongside the quality/dedup/contamination filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import scoped_persist
from ..registry import register
from ..sources import load_table

B = 256  # hashed n-gram buckets
TARGET_LANG = "en"
TOP_K = 50

_SPARK_TOKS = "filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')"
_DUCK_TOKS = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"
)

# unigrams ++ space-joined bigrams, as one array expression per row
_SPARK_GRAMS = (
    f"concat(toks, zip_with("
    f"slice(toks, 1, greatest(size(toks) - 1, 0)), "
    f"slice(toks, 2, greatest(size(toks) - 1, 0)), "
    f"(a, b) -> concat(a, ' ', b)))"
)
_DUCK_GRAMS = (
    "list_concat(toks, list_transform("
    "generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1]))"
)


def _duck_hex6(h: str) -> str:
    """First 6 hex chars of ``h`` as an integer (portable md5 family;
    DuckDB has no ``conv``)."""
    terms = [
        f"(strpos('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (5 - i)}"
        for i in range(6)
    ]
    return "(" + " + ".join(terms) + ")"


_SPARK_BUCKET = f"CAST(conv(substr(md5(gram), 1, 6), 16, 10) AS BIGINT) % {B}"
_DUCK_BUCKET = _duck_hex6("md5(gram)") + f" % {B}"

_ORACLE_WEIGHTS = f"""
    WITH toks AS (
      SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents
    ),
    grams AS (
      SELECT doc_id, lang, unnest({_DUCK_GRAMS}) AS gram FROM toks
    ),
    db AS (
      SELECT doc_id, lang, {_DUCK_BUCKET} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM grams GROUP BY 1, 2, 3
    ),
    raw AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS rb FROM db GROUP BY 1),
    tgt AS (
      SELECT bucket, CAST(SUM(c) AS BIGINT) AS tb
      FROM db WHERE lang = '{TARGET_LANG}' GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS rtot,
             CAST(SUM(CASE WHEN lang = '{TARGET_LANG}' THEN c ELSE 0 END)
                  AS BIGINT) AS ttot
      FROM db
    ),
    lp AS (
      SELECT raw.bucket,
             CAST(floor(ln(
                 (CAST(COALESCE(tgt.tb, 0) + 1 AS DOUBLE)
                  * CAST(tot.rtot + {B} AS DOUBLE))
               / (CAST(raw.rb + 1 AS DOUBLE)
                  * CAST(tot.ttot + {B} AS DOUBLE))
             ) * 1000000) AS BIGINT) AS lp_micro
      FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot
    )
    SELECT db.doc_id,
           CAST(SUM(db.c) AS BIGINT) AS n_grams,
           CAST(SUM(db.c * lp.lp_micro) AS BIGINT) AS logw_micro
    FROM db JOIN lp ON db.bucket = lp.bucket
    GROUP BY db.doc_id
"""


def _weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", "lang", F.expr(_SPARK_TOKS).alias("toks")
    ).select("doc_id", "lang", F.explode(F.expr(_SPARK_GRAMS)).alias("gram"))
    # one persisted frame feeds raw model + target model + weight join
    db = scoped_persist(
        grams.groupBy(
            "doc_id", "lang", F.expr(_SPARK_BUCKET).alias("bucket")
        ).agg(F.count(F.lit(1)).alias("c"))
    )
    raw = db.groupBy("bucket").agg(F.sum("c").cast("long").alias("rb"))
    tgt = (
        db.filter(F.col("lang") == TARGET_LANG)
        .groupBy("bucket")
        .agg(F.sum("c").cast("long").alias("tb"))
    )
    tot = db.agg(
        F.sum("c").cast("long").alias("rtot"),
        F.sum(
            F.when(F.col("lang") == TARGET_LANG, F.col("c")).otherwise(0)
        )
        .cast("long")
        .alias("ttot"),
    )
    lp = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot))  # 1-row totals
        .select(
            "bucket",
            F.floor(
                F.log(
                    (
                        (F.coalesce(F.col("tb"), F.lit(0)) + 1).cast("double")
                        * (F.col("rtot") + B).cast("double")
                    )
                    / (
                        (F.col("rb") + 1).cast("double")
                        * (F.col("ttot") + B).cast("double")
                    )
                )
                * 1000000
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        db.join(F.broadcast(lp), "bucket")  # lp <= B rows at ANY scale
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("lp_micro"))
            .cast("long")
            .alias("logw_micro"),
        )
    )


@register("dsir_importance_weights", oracle=_ORACLE_WEIGHTS)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-n-gram importance weight for every document."""
    return _weights(spark, sf_dir)


@register(
    "dsir_select_topk",
    oracle=f"""
    WITH w AS ({_ORACLE_WEIGHTS})
    SELECT doc_id, n_grams, logw_micro
    FROM w ORDER BY logw_micro DESC, doc_id LIMIT {TOP_K}
    """,
)
def dsir_select_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection itself: deterministic top-k by importance weight
    (distributed per-partition heaps, not a global sort)."""
    return (
        _weights(spark, sf_dir)
        .orderBy(F.desc("logw_micro"), F.asc("doc_id"))
        .limit(TOP_K)
    )
