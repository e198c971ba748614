"""SemDeDup two-level assignment at 1000x data / K=10000 — the next
decade after the r14 100x probe (PLANS.md): C = ceil(sqrt(K)) = 100,
distance evals ~ 2N*sqrt(K).  The question: does C's own growth open
a new knee (motivating a third level), or does the 2N*sqrt(K) curve
hold?

Protocol identical to the r14 probe: embeddings replicated with
per-replica vector rotation (no exact-duplicate artifact), K patched
to scale with N (K = 10 * mult), 1-pass timing (a multi-minute run;
the r14 points used 3-pass medians at <=100x, noted in the table).

Usage: python tools/semdedup_1000x_probe.py [--mult 1000] [--passes 1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=1000)
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--out", default="/tmp/semdedup_probe")
    args = ap.parse_args()

    import tools.scale_probe as sp
    from etl_xlsx_potgres_spark import caching, registry
    from etl_xlsx_potgres_spark.plans import corpus_ops, semantic_dedup

    registry.load_all()
    sp.PERTURB_EMBEDDINGS = True
    for t in list(sp.OFFSETS):
        if t != "embeddings":
            sp.OFFSETS[t] = {}

    spark = sp.get_spark(app_name="semdedup-1000x")
    scaled = os.path.join(args.out, f"x{args.mult}")
    if os.path.isdir(scaled):
        shutil.rmtree(scaled)
    t0 = time.time()
    sp.build_scaled(spark, scaled, args.mult)
    print(f"built {args.mult}x embeddings in {time.time() - t0:.1f}s",
          flush=True)

    k = 10 * args.mult
    corpus_ops.KMEANS_K = k
    semantic_dedup.KMEANS_K = k  # imported binding, patched separately
    print(f"K={k}, C=ceil(sqrt(K))={(k - 1) ** 0.5 // 1 + 1:.0f}",
          flush=True)

    times = []
    for p in range(args.passes):
        t0 = time.time()
        registry.QUERIES["dedup_semantic_clusters"](spark, scaled).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.time() - t0
        times.append(round(dt, 1))
        print(f"pass {p + 1}: {dt:.1f}s", flush=True)
        caching.release_persisted()
        spark.catalog.clearCache()
    print(json.dumps({"mult": args.mult, "K": k, "passes_sec": times}),
          flush=True)
    spark.stop()
    shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
