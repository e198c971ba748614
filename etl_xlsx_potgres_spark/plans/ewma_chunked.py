"""Chunked (two-level) EWMA fold — the bounded-memory variant of
``ts_ewma_by_user_type`` for entities whose event history exceeds one
task's array budget.

WHY. The plain plan (``plans/timeseries_extra.py``) materializes each
entity's full ordered history as one in-task array and folds it
sequentially — ``tools/ewma_skew_probe.py`` (r11, PLANS.md) measured
that shape healthy through a 500k-row hot group, with the knee at ~5M
rows in ONE group (~200 MB in-task array; OOM territory on a
4-8 GB-per-task executor near 1e8 rows/entity). EWMA is a LINEAR
recurrence (y_k = a*x_k + (1-a)*y_{k-1}), so a length-L chunk
composes to an affine map y_out = contrib + decay*y_in with
decay = (1-a)^L and contrib the same fold seeded with 0 — chunks
combine associatively in order. This plan is that fallback, shipped
and oracle-paired:

1. ``row_number`` over (entity ORDER BY ts, event_id) — streaming
   window sort, NO per-entity array;
2. group by (entity, chunk = (pos-1) div L): per-chunk arrays bounded
   at L rows; chunk 0 folds seeded with its head (the plain plan's
   initialization), later chunks fold seeded with 0.0 (their affine
   ``contrib``);
3. group by entity: the per-chunk summaries (count n/L, not n, per
   entity) combine via the closed form
   ewma = sum_i contrib_i * (1-a)^(n - cumlen_i), summed in ascending
   chunk order. With a = 1/2 every decay power is an exact power of
   two, so the scalings are exact and the ONLY rounding is the
   additions — mirrored left-associatively in the DuckDB oracle for a
   bit-exact match.

Both shuffles key on bounded groups (entity x chunk, then entity with
chunk-count-sized arrays); Catalyst reuses the window's
(user_id, event_type) hash partitioning for both downstream
aggregations (partitioning on a subset of the grouping keys satisfies
their clustering), so the whole plan carries ONE Exchange.

CHUNK is 4 here so the oracle-SF data (max 24 events per entity)
genuinely exercises multi-chunk composition; a production deployment
sizes L to the task array budget (e.g. 4096) — the shape is
identical.

Reference lifecycle note: the reference has no time-series stage
(``etl_process.py:1-235``); this extends the driver-mandated ts pack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

ALPHA = 0.5  # exactly representable: every decay is a power of two
CHUNK = 4


@register(
    "ts_ewma_chunked",
    oracle=f"""
    WITH pos AS (
      SELECT user_id, event_type, CAST(value AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS pos
      FROM events
    ),
    ch AS (
      SELECT user_id, event_type,
             CAST(floor((pos - 1) / {CHUNK}) AS BIGINT) AS chunk_id,
             list(x ORDER BY pos) AS xs
      FROM pos
      GROUP BY user_id, event_type, CAST(floor((pos - 1) / {CHUNK}) AS BIGINT)
    ),
    folded AS (
      SELECT user_id, event_type, chunk_id,
             CAST(len(xs) AS BIGINT) AS clen,
             xs[1] AS first_x,
             xs[len(xs)] AS last_x,
             CASE WHEN chunk_id = 0
                  THEN list_reduce(xs,
                         (acc, x) -> {ALPHA} * x + {1 - ALPHA} * acc)
                  ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs),
                         (acc, x) -> {ALPHA} * x + {1 - ALPHA} * acc)
             END AS val
      FROM ch
    ),
    entity AS (
      SELECT user_id, event_type,
             list({{'chunk_id': chunk_id, 'val': val, 'clen': clen,
                   'first_x': first_x, 'last_x': last_x}}
                  ORDER BY chunk_id) AS seq,
             CAST(sum(clen) AS BIGINT) AS n
      FROM folded
      GROUP BY user_id, event_type
    )
    SELECT user_id, event_type,
           n AS n_obs,
           seq[1].first_x AS first_value,
           seq[len(seq)].last_x AS last_value,
           list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, len(seq)), i ->
                 seq[i].val * pow({1 - ALPHA},
                   n - CAST(list_sum(list_transform(seq[1:i],
                                                    s -> s.clen))
                            AS BIGINT)))),
             (a, b) -> a + b) AS ewma
    FROM entity
    """,
)
def ts_ewma_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunked_ewma_plan(spark, sf_dir, CHUNK)


def chunked_ewma_plan(
    spark: SparkSession, sf_dir: str, chunk: int
) -> DataFrame:
    """The chunked fold at an arbitrary chunk length L — the affine
    composition is chunk-size-invariant (tests exercise L in
    {2, 4, 64} against the plain per-entity fold); the registered
    query pins L = CHUNK so the oracle SQL and the plan agree."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    pos = e.select(
        "user_id",
        "event_type",
        F.col("value").cast("double").alias("x"),
        F.row_number().over(w).alias("pos"),
    )
    chunks = (
        pos.withColumn(
            "chunk_id", F.floor((F.col("pos") - 1) / chunk).cast("long")
        )
        .groupBy("user_id", "event_type", "chunk_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("x")))
            ).alias("ps")
        )
        .withColumn("xs", F.expr("transform(ps, p -> p.x)"))
    )
    # chunk 0 folds seeded with its head (the plain plan's init);
    # later chunks fold seeded with 0.0 — their affine contribution
    val = F.expr(
        f"""
        CASE WHEN chunk_id = 0 THEN
          CASE WHEN size(xs) = 1 THEN element_at(xs, 1)
               ELSE aggregate(slice(xs, 2, size(xs) - 1),
                              element_at(xs, 1),
                              (acc, x) -> {ALPHA}D * x + {1 - ALPHA}D * acc)
          END
        ELSE aggregate(xs, CAST(0.0 AS DOUBLE),
                       (acc, x) -> {ALPHA}D * x + {1 - ALPHA}D * acc)
        END
        """
    )
    folded = chunks.select(
        "user_id",
        "event_type",
        "chunk_id",
        F.size("xs").cast("long").alias("clen"),
        F.element_at("xs", 1).alias("first_x"),
        F.element_at("xs", F.size("xs")).alias("last_x"),
        val.alias("val"),
    )
    entity = folded.groupBy("user_id", "event_type").agg(
        F.sort_array(
            F.collect_list(
                F.struct("chunk_id", "val", "clen", "first_x", "last_x")
            )
        ).alias("seq"),
        F.sum("clen").alias("n"),
    )
    # closed-form combine: every decay is an exact power of two, so
    # the scalings are exact and only the left-assoc additions round —
    # mirrored exactly in the oracle
    ewma = F.expr(
        f"""
        aggregate(sequence(1, size(seq)), CAST(0.0 AS DOUBLE),
          (acc, i) -> acc + element_at(seq, i).val *
            pow({1 - ALPHA}D,
                n - aggregate(slice(seq, 1, i), 0L,
                              (a, t) -> a + t.clen)))
        """
    )
    return entity.select(
        "user_id",
        "event_type",
        F.col("n").alias("n_obs"),
        F.element_at("seq", 1).first_x.alias("first_value"),
        F.element_at("seq", F.size("seq")).last_x.alias("last_value"),
        ewma.alias("ewma"),
    )
