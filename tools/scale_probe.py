"""Empirical scaling probe: replicate the sf0.1 tables 10x (with
id offsets so keys stay unique) into a /tmp scale dir and time a
representative query set at 1x vs 10x. Near-linear ratios are the
evidence that the plan shapes hold as data grows; anything clearly
super-linear is a scale bug to chase.

Pair-emitting dedup queries (minhash/ngram/embedding LSH pairs) are
deliberately excluded: replication manufactures exact duplicates, so
their OUTPUT grows quadratically in the multiplicity — a workload
artifact of the probe, not a plan property.

Usage:
    python tools/scale_probe.py [--mult 10] [--out /tmp/scale_probe]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_xlsx_potgres_spark import registry  # noqa: E402
from etl_xlsx_potgres_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
PERTURB_EMBEDDINGS = False
PERTURB_DOCUMENTS = False

# table -> columns to offset per replica so keys stay unique
OFFSETS = {
    "documents": {"doc_id": 100_000_000},
    "embeddings": {"vec_id": 100_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "orders": {"o_orderkey": 100_000_000},
    "lineitem": {"l_orderkey": 100_000_000},
    "customer": {},   # dims copied once (scale grows facts, as in TPC-H)
    "supplier": {},
    "part": {},
    "nation": {},
    "region": {},
}

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_corpus_segments",
    "text_unigram_logprob",
    "text_inverted_index",
    "text_bm25_search",
    "emb_kmeans_iterations",
    "emb_covariance_power_step",
    "zorder_locality_stats",
    "stats_chi2_lang_source",
    "ts_sessionize",
]


def build_scaled(spark, out_dir: str, mult: int) -> None:
    for table, offs in OFFSETS.items():
        src = os.path.join(BASE, f"{table}.parquet")
        dst = os.path.join(out_dir, f"{table}.parquet")
        if not offs:
            df = spark.read.parquet(src)
            df.write.mode("overwrite").parquet(dst)
            continue
        df = spark.read.parquet(src)
        copies = []
        for k in range(mult):
            c = df
            for col, step in offs.items():
                c = c.withColumn(col, (F.col(col) + F.lit(k * step)).cast(df.schema[col].dataType))
            if table == "documents" and PERTURB_DOCUMENTS and k > 0:
                # suffix every token with the replica index: replicas
                # get entirely disjoint token/shingle/signature spaces
                # while each replica's INTERNAL near-dup structure is
                # preserved (a family's docs share suffixed tokens the
                # same way they shared raw ones). Without this,
                # signature-keyed dedup queries measure the
                # exact-duplication artifact (10 identical copies =>
                # quadratic candidate pairs), not the plan's scaling —
                # the text twin of --perturb-embeddings.
                c = c.withColumn(
                    "text",
                    F.regexp_replace("text", r"(\S+)", f"$1x{k}"),
                )
            if table == "embeddings" and PERTURB_EMBEDDINGS and k > 0:
                # rotate each vector by k positions per replica:
                # norm-preserving but direction-changing, so replicas
                # are NOT exact duplicates of the originals — without
                # this, pair-emitting queries measure a replication
                # artifact (10 identical copies => guaranteed
                # cosine=1 pairs), not the plan's scaling.
                r = k % 16 or 1
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {r} + 1, "
                        f"size(embedding) - {r}), "
                        f"slice(embedding, 1, {r}))"
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(dst)


def time_queries(spark, sf_dir: str, passes: int = 3) -> dict[str, float]:
    import statistics

    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {q: [] for q in QUERIES}
    from etl_xlsx_potgres_spark import caching

    for _ in range(passes):
        for q in QUERIES:
            t0 = time.time()
            registry.QUERIES[q](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[q].append(time.time() - t0)
            # queries that persist would otherwise leave their caches
            # hot for passes 2-3, understating the scaled timing
            caching.release_persisted()
            spark.catalog.clearCache()
    for q in QUERIES:
        out[q] = round(statistics.median(samples[q]), 3)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--tables", default=None,
                    help="comma list: replicate only these (others copied 1x)")
    ap.add_argument("--queries", default=None, help="comma list subset")
    ap.add_argument("--perturb-embeddings", action="store_true",
                    help="rotate embedding arrays per replica (see build_scaled)")
    ap.add_argument("--perturb-documents", action="store_true",
                    help="suffix tokens per replica (see build_scaled)")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    if args.perturb_embeddings:
        global PERTURB_EMBEDDINGS
        PERTURB_EMBEDDINGS = True
    if args.perturb_documents:
        global PERTURB_DOCUMENTS
        PERTURB_DOCUMENTS = True
    if args.tables:
        keep = set(args.tables.split(","))
        for t in list(OFFSETS):
            if t not in keep:
                OFFSETS[t] = {}
    if args.queries:
        QUERIES[:] = args.queries.split(",")

    registry.load_all()
    spark = get_spark(app_name="scale-probe")
    scaled = os.path.join(args.out, f"x{args.mult}")
    if os.path.isdir(scaled):
        shutil.rmtree(scaled)
    t0 = time.time()
    build_scaled(spark, scaled, args.mult)
    print(f"built {args.mult}x tables in {time.time() - t0:.1f}s", flush=True)

    base_times = time_queries(spark, BASE, passes=args.passes)
    scaled_times = time_queries(spark, scaled, passes=args.passes)
    report = {
        "mult": args.mult,
        "base_sec": base_times,
        "scaled_sec": scaled_times,
        "ratio": {
            q: round(scaled_times[q] / max(base_times[q], 1e-3), 2)
            for q in QUERIES
        },
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
