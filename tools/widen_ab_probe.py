"""Interleaved widen-vs-unwidened A/B probe (r21, VERDICT r20 task 1).

The r20 driver regressions (dedup_embedding_lsh 0.69x,
dedup_semantic_clusters 0.80x, text_bigram_logprob 0.87x) were all
documents/embeddings consumers whose reads gained the intake respread;
the r20 builder's probes compared against a post-widen "before", so
they never measured the true r19 (unwidened) shape. This probe does:
for each named query it builds the frame twice per round — once with
the respread armed (SPARK_GRAFT_INTAKE_WIDEN=1) and once disarmed
(=0, the r19 read shape; the env var is read at plan-build time in
``sources.tables._widen_intake``) — and times the noop-sink execution
of each, interleaved A/B/A/B within ONE session so host drift hits
both variants equally. Reports per-variant medians.

Usage:
    python tools/widen_ab_probe.py --names a,b,c [--rounds 5]
        [--sf-dir /root/testdata/sf0.1] [--out /tmp/ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_xlsx_potgres_spark import caching, registry  # noqa: E402
from etl_xlsx_potgres_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="widen_ab_probe")
    registry.load_all()
    spark.range(1).count()

    names = [n.strip() for n in args.names.split(",") if n.strip()]
    results: dict[str, dict] = {}

    def run_once(name: str, widen: str) -> float:
        os.environ["SPARK_GRAFT_INTAKE_WIDEN"] = widen
        try:
            df = registry.QUERIES[name](spark, args.sf_dir)
            spark.sparkContext.setJobDescription(f"ab:{name}:widen={widen}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        finally:
            os.environ.pop("SPARK_GRAFT_INTAKE_WIDEN", None)
            spark.sparkContext.setJobDescription(None)
            caching.release_persisted()
            spark.catalog.clearCache()

    for name in names:
        on, off = [], []
        for _ in range(args.rounds):
            on.append(run_once(name, "1"))
            off.append(run_once(name, "0"))
        results[name] = {
            "widen_on_median": round(statistics.median(on), 3),
            "widen_off_median": round(statistics.median(off), 3),
            "on_samples": on,
            "off_samples": off,
        }
        print(json.dumps({name: results[name]}), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
