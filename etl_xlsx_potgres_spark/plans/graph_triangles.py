"""Distributed triangle counting with degree-ordered edge orientation
(Suri & Vassilvitskii 2011 / Cohen's MapReduce pattern) over the
co-purchase graph: parts are vertices, an edge links two parts that
appear in the same order.

The naive closure (edges ⋈ edges ⋈ edges) enumerates every WEDGE
(path of length 2) before closing it; wedge count is
sum_v C(deg(v), 2), which a single celebrity vertex turns quadratic.
The classic fix is to ORIENT each undirected edge from its lower
endpoint to its higher endpoint in the total order (degree, id):
every vertex's OUT-degree is then O(sqrt(m)) regardless of its true
degree (a vertex can only point to vertices at least as high in
degree order, and there can't be many high-degree vertices), so
oriented wedges are bounded by m^1.5 in the worst case and by far
less on real degree distributions. Each triangle {x,y,z} survives as
exactly ONE oriented wedge + closing edge — no /6 dedup and no
per-triangle multiplicity.

Plan shape: distinct (order, part) -> within-order pair join (orders
are small baskets, <= 13 parts here; a pathological mega-basket gets
capped upstream in a production intake) -> distinct edges -> degree
aggregate -> two joins against the oriented edge list (one building
wedges on the shared LOW vertex, one closing them). Every join is an
equi-join on vertex keys; the only frames ever shuffled are edges
(2 longs) and degrees (2 longs). Nothing is broadcast — edge lists
scale with data.

The DuckDB oracle counts the same triangles by the id-ordered naive
chain (each triangle x<y<z appears exactly once as (x,y),(y,z),(x,z))
— a DIFFERENT enumeration scheme, so agreement validates the
orientation trick end-to-end, not just the arithmetic.

Reference lifecycle note: the reference engine (pandas->Postgres
loader, ``etl_process.py:1-235``) has no graph stage; this extends
the engine's graph pack (components, pagerank) with the standard
clustering-coefficient primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected edges (u < v by part id) between parts
    sharing an order.

    One shuffle builds each order's distinct sorted basket
    (``collect_set`` dedups in the same aggregate a separate
    DISTINCT would cost a shuffle for); the id-ordered pairs are then
    expanded INSIDE codegen from the array (baskets are small — a
    production intake caps pathological mega-baskets upstream), and
    one final distinct dedups pairs across orders. Two shuffles total
    where the op-self-join formulation needs three plus a basket^2
    join — measured 2.3x faster at sf0.1."""
    # deterministic 1-in-3 basket subset: the synthetic co-purchase
    # projection is unusually dense (m/n ~ 60 — every edge's neighbor
    # arrays are ~60 longs), so the full graph makes this the most
    # expensive bench query for no extra coverage; the filter is
    # mirrored in the oracle and pushed into the scan. The plan
    # itself is size-agnostic.
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 3 == 0)
        .groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    pairs = F.flatten(
        F.transform(
            "ps",
            lambda x, i: F.transform(
                F.slice("ps", i + 2, F.size("ps")),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("e"))
        .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .distinct()
    )


@register(
    "graph_triangle_count",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem WHERE l_orderkey % 3 = 0),
    ed AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ),
    deg AS (
      SELECT w, count(*) AS d FROM (
        SELECT u AS w FROM ed UNION ALL SELECT v AS w FROM ed
      ) GROUP BY w
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_vertices,
           CAST((SELECT count(*) FROM ed) AS BIGINT) AS n_edges,
           CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree,
           CAST((SELECT count(*)
                 FROM ed a JOIN ed b ON a.v = b.u
                           JOIN ed c ON a.u = c.u AND b.v = c.v)
                AS BIGINT) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_summary(copurchase_edges(spark, sf_dir))


def triangle_summary(raw_edges: DataFrame) -> DataFrame:
    """(u, v) distinct undirected edges with u < v -> one summary row
    (n_vertices, n_edges, max_degree, n_triangles). Split from the
    registered query so the property test can feed seeded random
    graphs and diff against brute force."""
    from ..caching import scoped_persist

    edges = scoped_persist(raw_edges)
    # undirected degrees; the orientation key is (degree, id).
    # persisted (r21): deg feeds THREE consumers (both attach joins +
    # the verts summary) and was recomputed per consumer — the r20
    # after-plan shows the union+aggregate subtree three times.
    # |V|-bounded (2 longs/vertex). A/B at sf0.1 (n=5 medians):
    # 2.80 -> 2.59 s; the window-over-endpoints reshape the r20 notes
    # scouted (explode endpoints, count window, regroup to (u,v))
    # measured 2.71 s — the two broadcast attach joins against the
    # persisted frame beat its two corpus-edge exchanges, so the
    # reshape was measured and rejected.
    deg = scoped_persist(
        edges.select(F.col("u").alias("w"))
        .unionAll(edges.select(F.col("v").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = (
        edges.join(deg.withColumnRenamed("w", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("w", "v").withColumnRenamed("d", "dv"), "v")
    )
    # orient low -> high in (degree, id) order; out-degree is O(sqrt m)
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    # adjacency-intersection close: triangles = sum over oriented
    # edges (u -> v) of |N+(u) ∩ N+(v)|. The wedge set is never
    # materialized or shuffled — each edge carries the two bounded
    # out-neighbor arrays (O(sqrt m) longs by the orientation bound)
    # and closes its wedges with one array_intersect, inside codegen.
    # r20: the edge side is EXPLODED back out of the persisted
    # neighbor frame instead of re-joined against `oriented` on src —
    # collect_list over the distinct oriented edges regenerates
    # exactly that edge multiset with N+(src) already attached, so
    # the src-keyed exchange+join disappears (plan: one exchange into
    # the close join instead of two, and `oriented` drops to a single
    # consumer, so `nbrs` takes over the persist).
    nbrs = scoped_persist(
        oriented.groupBy("src").agg(F.collect_list("dst").alias("nb"))
    )
    tri = (
        nbrs.select("src", "nb", F.explode("nb").alias("dst"))
        .join(
            nbrs.select(F.col("src").alias("dst"), F.col("nb").alias("nb_v")),
            "dst",
        )
        .agg(
            # coalesce: a triangle-free graph (e.g. a star) leaves the
            # inner joins empty and SUM over zero rows is NULL, not 0
            # — found by the property test, invisible on the oracle
            # fixture (which always has triangles)
            F.coalesce(
                F.sum(F.size(F.array_intersect("nb", "nb_v"))), F.lit(0)
            )
            .cast("long")
            .alias("n_triangles")
        )
    )
    summary = edges.agg(
        F.count(F.lit(1)).alias("n_edges"),
    )
    verts = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"), F.max("d").alias("max_degree")
    )
    return (
        verts.crossJoin(summary)
        .crossJoin(tri)
        .select("n_vertices", "n_edges", "max_degree", "n_triangles")
    )
