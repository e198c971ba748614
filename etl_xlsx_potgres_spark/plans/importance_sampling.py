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

Plan shape (r20 rewrite, guide §8 "decide with small rows"): the
model FIT is the only shuffle — the gram explode feeds a groupBy on
the B-bounded bucket key, so map-side partials reduce it to <= B rows
per task at ANY corpus volume. The fitted model then rides as ONE row
(``map<bucket, lp_micro>``, <= B entries) broadcast to a second,
map-only pass that scores each document by folding its own row-local
gram array against the map — no per-(doc, bucket) count frame is ever
materialized, joined, or rolled up. (The previous shape persisted
that corpus-scale frame and paid a model join plus a doc_id rollup
shuffle on it; two scans + a constant-size shuffle beat one scan +
two corpus-scale shuffles and a corpus-scale cache everywhere past
toy SF.) The top-k variant is a ``TakeOrderedAndProject``
(per-partition heaps + driver merge of k), never a global sort.

Reference lifecycle note: the reference has no corpus stage
(``etl_process.py:1-235``); this extends the driver-mandated
LLM-curation pack alongside the quality/dedup/contamination filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..hints import constant_size
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


def bucket_of(gram):
    """``_SPARK_BUCKET`` as a composable Column (identical arithmetic)
    — usable on a lambda variable inside row-local HOFs, which is what
    lets scoring happen without the per-doc explode."""
    return F.conv(F.substring(F.md5(gram), 1, 6), 16, 10).cast("long") % B


def _grams_arr(d: DataFrame, *extra: str) -> DataFrame:
    """(extra..., grams) with the unigram++bigram array kept row-local
    (the explode stays confined to the model-fit pass)."""
    return d.select(*extra, F.expr(_SPARK_TOKS).alias("toks")).select(
        *extra, F.expr(_SPARK_GRAMS).alias("grams")
    )


def _feat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, bkts): every document with its grams hashed ONCE
    into a row-local bucket-id array (``bkts`` is NULL where the token
    array is NULL, empty where it is empty — the doc grain is
    preserved). Persisted because the model fit and the scoring fold
    both consume it; the md5 per gram — the dominant per-row cost — is
    paid exactly once, and the cached rows are bigint arrays, not
    text."""
    from ..caching import scoped_persist

    d = load_table(spark, sf_dir, "documents")
    return scoped_persist(
        _grams_arr(d, "doc_id", "lang").select(
            "doc_id", "lang", F.transform("grams", bucket_of).alias("bkts")
        )
    )


def _lpmap(feat: DataFrame) -> DataFrame:
    """The fitted DSIR bucket model as ONE row carrying a dense B-slot
    array — constant-size at any corpus volume, so consumers can score
    documents row-locally against a broadcast instead of shuffling a
    per-(doc, bucket) count frame into a model join + doc rollup (r20
    rewrite; the model FIT keeps the explode — of bigint bucket ids,
    not gram strings — and its groupBy is on the B-bounded bucket key,
    so map-side partials reduce the shuffle to <= B rows per task)."""
    grams = feat.select("lang", F.explode("bkts").alias("bucket"))
    # rb = every occurrence, tb = occurrences in target-lang docs;
    # identical to the old raw/tgt pair (tb = 0 where tgt had no row,
    # matching its COALESCE(tb, 0))
    cls = grams.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("rb"),
        F.sum(F.when(F.col("lang") == TARGET_LANG, 1).otherwise(0))
        .cast("long")
        .alias("tb"),
    )
    tot = cls.agg(
        F.sum("rb").cast("long").alias("rtot"),
        F.sum("tb").cast("long").alias("ttot"),
    )
    lp = cls.crossJoin(constant_size(tot)).select(  # 1-row totals
        "bucket",
        F.floor(
            F.log(
                (
                    (F.col("tb") + 1).cast("double")
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
    return _dense_model_arr(lp, "lp_micro", "lparr")


def _dense_model_arr(model: DataFrame, val: str, out: str) -> DataFrame:
    """Pack a (bucket, value) model into ONE row carrying a dense
    B-slot array (index = bucket). Lookups against a map literal cost
    a LINEAR scan of its entries per call (UnsafeMapData has no hash
    index), so a per-gram fold over a 256-entry map pays 256
    comparisons per gram; the dense array is one O(1) index. Buckets
    the corpus never produced stay NULL — and are never looked up,
    because scoring only probes buckets of grams the fit also saw."""
    return model.agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", val))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(B - 1).cast("long")),
            lambda b: F.try_element_at(F.col("m"), b),
        ).alias(out)
    )


def _arr_at(arr, bucket):
    """O(1) dense-array model lookup (1-based element_at)."""
    return F.element_at(arr, (bucket + 1).cast("int"))


def _weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scoring is row-local (guide §8's "decide with small rows"): each
    # doc folds its own bucket-id array against the broadcast model
    # array — n_grams is the array size, logw the bigint sum of
    # per-occurrence lp_micro lookups (same integers the old
    # c * lp_micro join-rollup summed, grouped differently). Every
    # bucket a doc probes is in the model by construction (the fit
    # saw the same corpus). This replaces the corpus-scale persisted
    # (doc, bucket) count frame, its model join, and the doc_id
    # rollup shuffle with a fold over the shared featurize frame;
    # only the <= B-row model fit shuffles.
    feat = _feat(spark, sf_dir)
    docs = feat.filter(F.size("bkts") > 0)
    return docs.crossJoin(constant_size(_lpmap(feat))).select(
        "doc_id",
        F.size("bkts").cast("long").alias("n_grams"),
        F.aggregate(
            "bkts",
            F.lit(0).cast("long"),
            lambda acc, b: acc + _arr_at(F.col("lparr"), b),
        ).alias("logw_micro"),
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
