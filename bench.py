"""Bench harness (driver contract): run every declared query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Each query executes through a noop sink (full plan incl. sorts, no
driver collect overhead). Session startup and JIT warm-up are excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from yamon_spark.queries import all_queries
from yamon_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("yamon-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    # steady-state warm-up: run every query once at the smallest SF so
    # whole-stage-codegen JIT + Arrow/python-worker startup are excluded
    # from the timed sf run (the first queries otherwise absorb all of it)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in sorted(qs):
            try:
                qs[name].build(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:  # noqa: BLE001 - warm-up must never fail the bench
                pass

    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        df = qs[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "declared_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
