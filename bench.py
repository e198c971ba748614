#!/usr/bin/env python
"""Benchmark runner: executes the headline query library at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion through the `noop` sink so the
full distributed plan runs without a driver-side collect.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_xlsx_potgres_spark import registry
from etl_xlsx_potgres_spark.session import get_spark

# Queries representative of the engine's surface; None = every
# registered query.
HEADLINE: list[str] | None = None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    registry.load_all()
    names = HEADLINE if HEADLINE is not None else sorted(registry.QUERIES)

    # Warm the JVM/codegen path once so per-query numbers measure the
    # queries, not session startup (startup is reported separately).
    t0 = time.perf_counter()
    spark.range(1).count()
    warm = time.perf_counter() - t0

    times: dict[str, float] = {}
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "n_queries": len(times),
                "warmup_sec": round(warm, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
