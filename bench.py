#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §6, BASELINE.md protocol).

Runs every declared query from the registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": <suite total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is forced through the noop sink (full plan runs, no driver-side
collect cost).  One warm-up query amortizes JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                        _load_all_modules)
from data_eng_iceberg_demo_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    _load_all_modules()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    force(REGISTRY["join_multiway"].fn(spark, sf_dir))  # warm-up

    times: dict[str, float] = {}
    t_suite = time.time()
    for name in sorted(REGISTRY):
        t0 = time.time()
        try:
            force(REGISTRY[name].fn(spark, sf_dir))
            times[name] = round(time.time() - t0, 3)
        except Exception as ex:  # record failures instead of dying
            times[name] = -1.0
            print(f"# bench FAILED {name}: {ex}", file=sys.stderr)
    total = round(time.time() - t_suite, 3)

    print(json.dumps({
        "metric": "declared_query_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_queries": len(times),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }))
    # graceful stop lets Spark's shutdown hooks remove its own /tmp
    # runtime dirs (spark-*, blockmgr-*)
    spark.stop()


if __name__ == "__main__":
    main()
