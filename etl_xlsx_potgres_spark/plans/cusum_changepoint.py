"""Two-sided CUSUM changepoint detection over daily event volumes
(Page 1954 — the sequential control chart every pipeline-health
monitor reimplements): per event type, the positive chart accumulates
``max(0, S + x - mu - kappa)`` and the negative chart
``max(0, S + mu - x - kappa)``; an alarm fires when either chart
crosses ``h``.  The drift family's third member: TV distance
(``drift_weekly_value_hist``) and PSI (``drift_psi_reference``)
compare DISTRIBUTIONS per window — CUSUM finds WHEN the level
shifted.

Changepoint synthesis: the fixture's daily volumes are stable Poisson
noise (no real level shift — verified: with textbook parameters no
chart ever alarms), so shifts are SEEDED deterministically the way
every other synthesized operator does it — a pure function of
(event_type, day): ``signup``/``click`` gain +20/day from Jan 20 (a
feature launch), ``error`` loses 20/day from Jan 16 (an outage fix);
``purchase``/``view`` stay untouched.  The upward chart, the downward
chart, and the quiet path are all non-vacuous at sf0.01.

Parameterization is the textbook one, calibrated on an in-control
REFERENCE WINDOW (the first 10 days, before any seeded shift):
``mu``/``sigma`` from the window's exact bigint sums, ``kappa =
sigma/2`` (tuned to detect ~1-sigma shifts), ``h = 4*sigma``.  The
recursion has the closed form ``S_t = P_t - min(0, min_{k<=t} P_k)``
over prefix sums of the deviations; deviations/thresholds quantize to
integer micro-units BEFORE any accumulation (sigma's single sqrt is
correctly rounded from an exact rational, then floored to micros —
the quantize-then-sum discipline), so every chart value and verdict
is exact bigint arithmetic, bit-identical at any partitioning.

Plan shape: ONE corpus pass builds (event_type, day) counts (map-side
partials); each type's series collapses to one row (ordered collect)
where prefix sums/minima are row-local array HOFs — O(days^2) per
type, and the day axis grows with TIME, not data volume (~365/yr), so
the quadratic term is bounded regardless of corpus size.  Days with
zero events are absent from the series (the chart advances on
observed days), documented rather than densified.

Reference lifecycle note: the reference ETL (etl_process.py:1-235)
has no monitoring surface; changepoint detection is north-star
pipeline-health machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

CAL_DAYS = 10  # in-control reference window (pre-shift by design)

_SPARK_SHIFT = (
    "cnt + CASE WHEN event_type IN ('signup', 'click')"
    " AND day >= DATE'2024-01-20' THEN 20 "
    "WHEN event_type = 'error' AND day >= DATE'2024-01-16' THEN -20 "
    "ELSE 0 END"
)
_DUCK_SHIFT = _SPARK_SHIFT.replace("DATE'", "DATE '")

# mu/kappa/h in micro-units from the first CAL_DAYS counts (exact
# bigint sums; the single sqrt is correctly rounded, then floored)
_SPARK_CAL = f"""
named_struct(
  'mu', aggregate(slice(cnts, 1, {CAL_DAYS}), 0L, (a, x) -> a + x)
        * 1000000L DIV {CAL_DAYS},
  'sg', CAST(floor(sqrt(
          (CAST({CAL_DAYS} AS DOUBLE)
             * aggregate(slice(cnts, 1, {CAL_DAYS}), 0L,
                         (a, x) -> a + x * x)
           - CAST(aggregate(slice(cnts, 1, {CAL_DAYS}), 0L,
                            (a, x) -> a + x) AS DOUBLE)
             * aggregate(slice(cnts, 1, {CAL_DAYS}), 0L, (a, x) -> a + x))
          / ({CAL_DAYS} * {CAL_DAYS})) * 1000000) AS BIGINT))
"""

_DUCK_CAL = f"""
struct_pack(
  mu := CAST(list_sum(list_slice(cnts, 1, {CAL_DAYS})) * 1000000
             // {CAL_DAYS} AS BIGINT),
  sg := CAST(floor(sqrt(
          (CAST({CAL_DAYS} AS DOUBLE)
             * list_sum(list_transform(list_slice(cnts, 1, {CAL_DAYS}),
                                       x -> x * x))
           - CAST(list_sum(list_slice(cnts, 1, {CAL_DAYS})) AS DOUBLE)
             * list_sum(list_slice(cnts, 1, {CAL_DAYS})))
          / ({CAL_DAYS} * {CAL_DAYS})) * 1000000) AS BIGINT))
"""


@register(
    "ts_cusum_changepoint",
    oracle=f"""
    WITH daily0 AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT event_type, day, CAST({_DUCK_SHIFT} AS BIGINT) AS cnt
      FROM daily0
    ),
    series AS (
      SELECT event_type,
             list(day ORDER BY day) AS days,
             list(cnt ORDER BY day) AS cnts
      FROM daily GROUP BY event_type
    ),
    cal AS (
      SELECT event_type, days, cnts, {_DUCK_CAL} AS c FROM series
    ),
    parms AS (
      SELECT event_type, days, cnts,
             c.mu AS mu, c.sg // 2 AS kap, 4 * c.sg AS h
      FROM cal
    ),
    devs AS (
      SELECT event_type, days, cnts, h,
             list_transform(cnts, x -> x * 1000000 - mu - kap) AS dpos,
             list_transform(cnts, x -> mu - x * 1000000 - kap) AS dneg
      FROM parms
    ),
    prefixed AS (
      SELECT event_type, days, cnts, h,
             list_transform(generate_series(1, len(cnts)),
               t -> CAST(list_sum(list_slice(dpos, 1, t)) AS BIGINT)) AS ppos,
             list_transform(generate_series(1, len(cnts)),
               t -> CAST(list_sum(list_slice(dneg, 1, t)) AS BIGINT)) AS pneg
      FROM devs
    ),
    charted AS (
      SELECT event_type, days, cnts, h,
             list_transform(generate_series(1, len(ppos)), t ->
               ppos[t] - least(CAST(0 AS BIGINT),
                 CAST(list_min(list_slice(ppos, 1, t)) AS BIGINT))) AS spos,
             list_transform(generate_series(1, len(pneg)), t ->
               pneg[t] - least(CAST(0 AS BIGINT),
                 CAST(list_min(list_slice(pneg, 1, t)) AS BIGINT))) AS sneg
      FROM prefixed
    )
    SELECT event_type, days[t] AS day, cnts[t] AS cnt,
           CAST(spos[t] AS BIGINT) AS s_pos_micro,
           CAST(sneg[t] AS BIGINT) AS s_neg_micro,
           spos[t] > h AS alarm_up,
           sneg[t] > h AS alarm_down
    FROM charted, LATERAL unnest(generate_series(1, len(days))) u(t)
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.col("ts").cast("date").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "event_type",
            "day",
            F.expr(_SPARK_SHIFT).cast("long").alias("cnt"),
        )
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, cnt)))," " s -> s.day)"
        ).alias("days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, cnt)))," " s -> s.cnt)"
        ).alias("cnts"),
    )
    parms = series.withColumn("c", F.expr(_SPARK_CAL)).select(
        "event_type",
        "days",
        "cnts",
        F.col("c.mu").alias("mu"),
        F.expr("c.sg DIV 2").alias("kap"),
        F.expr("4 * c.sg").alias("h"),
    )
    devs = parms.select(
        "event_type",
        "days",
        "cnts",
        "h",
        F.expr("transform(cnts, x -> x * 1000000 - mu - kap)").alias("dpos"),
        F.expr("transform(cnts, x -> mu - x * 1000000 - kap)").alias("dneg"),
    )

    def prefix(devs_col: str) -> str:
        return (
            f"transform(sequence(1, size(cnts)), t -> "
            f"aggregate(slice({devs_col}, 1, t), 0L, (a, x) -> a + x))"
        )

    def chart(prefix_col: str) -> str:
        return (
            f"transform(sequence(1, size({prefix_col})), t -> "
            f"element_at({prefix_col}, t)"
            f" - least(0L, array_min(slice({prefix_col}, 1, t))))"
        )

    prefixed = devs.select(
        "event_type",
        "days",
        "cnts",
        "h",
        F.expr(prefix("dpos")).alias("ppos"),
        F.expr(prefix("dneg")).alias("pneg"),
    )
    charted = prefixed.select(
        "event_type",
        "days",
        "cnts",
        "h",
        F.expr(chart("ppos")).alias("spos"),
        F.expr(chart("pneg")).alias("sneg"),
    )
    return charted.select(
        "event_type",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(days)), t -> named_struct("
                "'day', element_at(days, t),"
                "'cnt', element_at(cnts, t),"
                "'s_pos_micro', element_at(spos, t),"
                "'s_neg_micro', element_at(sneg, t),"
                "'alarm_up', element_at(spos, t) > h,"
                "'alarm_down', element_at(sneg, t) > h))"
            )
        ).alias("_i", "r"),
    ).select(
        "event_type",
        F.col("r.day").alias("day"),
        F.col("r.cnt").alias("cnt"),
        F.col("r.s_pos_micro").alias("s_pos_micro"),
        F.col("r.s_neg_micro").alias("s_neg_micro"),
        F.col("r.alarm_up").alias("alarm_up"),
        F.col("r.alarm_down").alias("alarm_down"),
    )
