"""SQL scripting (new in Spark 4.1: BEGIN/END blocks, DECLARE'd
session variables, WHILE loops executed by the engine) — the
procedural surface that replaces driver-side Python loops for
control-flow-bound analytics, keeping the whole routine inside one
SQL submission.

The script walks a threshold ladder: starting at 100_000 it halves
the price threshold until at least MIN_ROWS orders exceed it — the
classic "find a cutoff that yields enough rows" calibration loop
(each probe is one aggregate; the loop is data-dependent, so no
static plan can express it). Result: the chosen threshold, the count
at that threshold, and the number of probes taken.

The DuckDB oracle computes the same fixpoint declaratively: generate
the ladder, count per rung (one grouped pass), pick the first rung
satisfying the predicate. Same data, two fundamentally different
formulations — agreement pins the scripting engine's loop/variable
semantics against ground truth.

Reference lifecycle note: the reference drives its loop logic from
Python (``importador.py:29-56`` iterates files imperatively); SQL
scripting moves the equivalent control flow into the engine.

Scale: each iteration is a full-pushdown aggregate scan; iterations
are log2(start/final) — a handful — and nothing accumulates state
beyond three session variables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources import register_views

START = 100_000.0
MIN_ROWS = 1_000
MAX_PROBES = 40

_SCRIPT = f"""
BEGIN
  DECLARE thr DOUBLE DEFAULT {START!r};
  DECLARE cnt BIGINT DEFAULT 0;
  DECLARE probes BIGINT DEFAULT 0;
  SET cnt = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
  SET probes = 1;
  WHILE cnt < {MIN_ROWS} AND probes < {MAX_PROBES} DO
    SET thr = thr / 2;
    SET cnt = (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr);
    SET probes = probes + 1;
  END WHILE;
  SELECT thr AS threshold, cnt AS n_above, probes AS n_probes;
END
"""


@register(
    "script_threshold_ladder",
    oracle=f"""
    WITH ladder AS (
      SELECT i, {START!r} / power(2, i) AS thr
      FROM generate_series(0, {MAX_PROBES - 1}) t(i)
    ),
    counted AS (
      SELECT l.i, l.thr,
             (SELECT COUNT(*) FROM orders o
              WHERE o.o_totalprice > l.thr) AS cnt
      FROM ladder l
    )
    SELECT thr AS threshold, cnt AS n_above,
           CAST(i + 1 AS BIGINT) AS n_probes
    FROM counted
    WHERE cnt >= {MIN_ROWS} OR i = {MAX_PROBES - 1}
    ORDER BY i LIMIT 1
    """,
)
def script_threshold_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(_SCRIPT)
