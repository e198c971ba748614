"""Native recursive CTE (``WITH RECURSIVE``, new in Spark 4) — the
linear-recursion SQL surface: each customer's orders form a chain in
(date, key) order and the recursion walks the first ``MAX_STEPS``
links accumulating a running balance. The same walk is the classic
hierarchy/BOM traversal shape; the step bound keeps the recursion
depth fixed (8) regardless of data size — recursion cost is
(levels x per-level join), and unbounded chains would tie wall-time
to the longest chain in the data.

Reference lifecycle note: the reference has no recursive surface;
its FK-ordered load sequence (``importador.py:29-56``) is the closest
analogue of dependency-ordered traversal.

Why this exists next to the window running total
(``win_running_total``): window frames express PREFIX aggregates
only; true recursion also covers state machines and conditional
carry-forward that frames cannot (and until Spark 4 needed the
iterative-DataFrame loops of ``graph_iterative``). This query pins
the engine's native recursion against DuckDB's — same seed row, same
step join, same step-ordered arithmetic.

Plan note (measured): a plain CTE inside the recursive query is
INLINED — the rank window would be recomputed at every level
(17 s at sf0.01). The rank index is therefore materialized once as a
persisted temp view; each level is then one equi-join of the
one-row-per-customer frontier against an InMemoryRelation.

Determinism: per-chain accumulation happens in step order in both
engines and the balance is carried in exact DECIMAL(18,2) (cast to
double only at output), so agreement is bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..caching import scoped_persist
from ..registry import register
from ..sources import register_views

MAX_STEPS = 8

_RANKED_SQL = """
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
"""

_CHAIN_BODY = f"""
chain AS (
  SELECT o_custkey, o_orderkey, rn AS step,
         CAST(o_totalprice AS DECIMAL(18,2)) AS running
  FROM ranked WHERE rn = 1
  UNION ALL
  SELECT r.o_custkey, r.o_orderkey, r.rn,
         CAST(c.running + CAST(r.o_totalprice AS DECIMAL(18,2))
              AS DECIMAL(18,2))
  FROM chain c
  JOIN ranked r ON r.o_custkey = c.o_custkey AND r.rn = c.step + 1
  WHERE c.step < {MAX_STEPS}
)
SELECT o_custkey, o_orderkey, CAST(step AS BIGINT) AS step,
       CAST(running AS DOUBLE) AS running_total
FROM chain
"""


@register(
    "subquery_recursive_chain",
    oracle=f"WITH RECURSIVE ranked AS ({_RANKED_SQL}), {_CHAIN_BODY}",
)
def subquery_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    ranked = scoped_persist(spark.sql(_RANKED_SQL))
    ranked.createOrReplaceTempView("ranked")
    ranked.count()  # materialize before the recursion starts scanning
    return spark.sql(f"WITH RECURSIVE {_CHAIN_BODY}")
