"""Per-query isolation probe for the optimization rounds (guide §1).

For each named query: build the frame, dump `.explain("formatted")`
to --plans-dir/<name>.txt, then time N isolated noop-sink executions
(the bench's own timed action) and report min/median plus a coarse
plan-shape summary (Exchange count, join strategies, Python boundary
nodes) so before/after claims are checkable without a Spark UI.

Usage:
    python tools/perf_probe.py --names a,b,c [--runs 3]
        [--plans-dir plans/r20] [--suffix _before] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_xlsx_potgres_spark import caching, registry  # noqa: E402
from etl_xlsx_potgres_spark.session import get_spark  # noqa: E402


def plan_shape(plan: str) -> dict:
    """Coarse shape counters over an explain('formatted') dump."""
    return {
        "exchange": len(re.findall(r"\bExchange\b", plan)),
        "sort": len(re.findall(r"^\s*[+:]?-?\s*\*?\(?\d*\)?\s*Sort\b", plan, re.M)),
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "python": (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInArrow")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("PythonUDTF")
        ),
        "rowtoColumnar": plan.count("RowToColumnar"),
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="perf_probe")
    registry.load_all()
    spark.range(1).count()  # JVM/codegen warmup

    names = [n.strip() for n in args.names.split(",") if n.strip()]
    results: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df = fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        caching.release_persisted()
        spark.catalog.clearCache()
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(
                os.path.join(args.plans_dir, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        ts = []
        for _ in range(args.runs):
            df = fn(spark, args.sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
            caching.release_persisted()
            spark.catalog.clearCache()
        results[name] = {
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
            "samples": ts,
            "shape": plan_shape(plan),
        }
        print(json.dumps({name: results[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
