"""Shuffle VOLUME probe — the Exchange-count budgets pin plan shape,
but the currency at 100 TB is bytes moved. This probe runs named
queries with the Spark UI enabled, attributes stages to each query
via job groups, and sums shuffle read/write bytes and records
from the UI REST API (/api/v1) — ground truth from the engine's own
metrics, not an estimate.

Use the per-query bytes/row-of-input figures to extrapolate: a query
shuffling S bytes at sf0.1 moves ~1e4 * S at the 1000x corpus IF its
shuffle volume is input-linear (the probe at two SFs checks that).

    python tools/shuffle_volume_probe.py [--sf /root/testdata/sf0.1]
        [--queries a,b,c] [--out /tmp/shuffle_volume.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_xlsx_potgres_spark import registry  # noqa: E402

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q9_product_profit",
    "curation_pipeline_stats",
    "dedup_minhash_lsh_pairs",
    "dedup_substring_windows",
    "text_bigram_logprob",
    "text_encode_ids",
    "text_inverted_index",
    "agg_countmin_heavy_hitters",
    "emb_pq_encode",
    "dedup_connected_components",
    "subquery_recursive_chain",
]


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def probe(sf_dir: str, names: list[str]) -> dict:
    from pyspark.sql import SparkSession

    # fresh UI-enabled session (the shared factory disables the UI)
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("shuffle-volume-probe")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    sc = spark.sparkContext
    base = sc.uiWebUrl
    if base is None:
        # getOrCreate returned a pre-existing UI-disabled session —
        # the REST probe cannot run against it; fail with the cause
        # instead of a confusing urlopen(None) crash downstream
        raise RuntimeError(
            "Spark UI is disabled on the existing session; run this "
            "probe in a fresh process (no prior SparkSession)."
        )
    app_id = sc.applicationId
    out: dict[str, dict] = {}
    for name in names:
        spark.catalog.clearCache()
        sc.setJobGroup(name, name, interruptOnCancel=False)
        t0 = time.time()
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        sc.setJobGroup("idle", "idle")
        jobs = _api(base, f"applications/{app_id}/jobs")
        stage_ids = {
            sid
            for j in jobs
            if j.get("jobGroup") == name
            for sid in j.get("stageIds", [])
        }
        stages = _api(base, f"applications/{app_id}/stages?status=complete")
        agg = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
               "input_bytes": 0, "shuffle_write_records": 0}
        for s in stages:
            if s["stageId"] in stage_ids:
                agg["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
                agg["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
                agg["input_bytes"] += s.get("inputBytes", 0)
                agg["shuffle_write_records"] += s.get(
                    "shuffleWriteRecords", 0
                )
        agg["wall_sec"] = round(wall, 2)
        out[name] = agg
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--out", default="/tmp/shuffle_volume.json")
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES
    registry.load_all()
    report = {"sf_dir": args.sf, "queries": probe(args.sf, names)}
    print(json.dumps(report, indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
