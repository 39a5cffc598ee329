"""The decisive posting-list-knee measurement: per-task partition volume.

split_jvm_knee.py refuted the single-heap-GC attribution — dedup_jaccard's
100->300x segment exponent is ~1.5 with the heap split across two worker
JVMs, same as in one JVM. The remaining suspect is the harness's FIXED
spark.sql.shuffle.partitions = 32: per-task shuffle-partition volume then
grows linearly with corpus size, so sort buffers outgrow execution
memory, spill, and GC-thrash — a per-TASK density effect that splitting
heaps cannot touch (task count is unchanged) but that NO real deployment
has, because partitions are sized to data (AQE's
coalescePartitions.initialPartitionNum high, coalesced down when small).

This script measures exactly that: the same ops, same single-JVM session,
at 100x and 300x, with shuffle partitions at the harness's 32 vs scaled
(factor-proportional, capped at 1024). If the scaled exponent drops to
~1, the knee is partition sizing, not the algorithm.

Usage: python scripts/partition_knee.py [ops...]
Writes results under SCALE_CURVE.json key "partition_knee".
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

BASE = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
DEFAULT_OPS = ["dedup_jaccard", "dedup_containment"]
FACTORS = (100, 300)


def scaled_partitions(factor: int) -> int:
    # ~32 partitions per 1x of corpus, the shape AQE's initialPartitionNum
    # gives a real cluster; capped so the scheduler overhead stays sane
    return min(1024, 32 * max(1, factor // 32))


def time_op(build, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ops = sys.argv[1:] or DEFAULT_OPS

    from scripts.scale_curve import synthesize
    from yamon_spark.queries import all_queries
    from yamon_spark.session import get_spark

    spark = get_spark("yamon-partition-knee")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    dirs = {}
    results = {}
    try:
        for factor in FACTORS:
            d = tempfile.mkdtemp(prefix=f"yamon_pknee{factor}x_")
            t0 = time.perf_counter()
            synthesize(spark, BASE, d, factor)
            print(f"synthesized {factor}x in {time.perf_counter() - t0:.1f}s", flush=True)
            dirs[factor] = d

        # three configurations per op:
        #   fixed32 — the harness default (the suspected knee)
        #   scaled  — shuffle.partitions hard-scaled with the factor
        #   aqe512  — shuffle.partitions stays 32 but AQE's
        #             initialPartitionNum=512: shuffles START wide and
        #             coalesce down by observed size — the config a real
        #             cluster runs, and the candidate session default
        INITIAL_KEY = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
        for name in ops:
            build = qs[name].build
            build(spark, WARM).write.format("noop").mode("overwrite").save()
            rec = {}
            for mode in ("fixed32", "scaled", "aqe512"):
                walls = {}
                for factor in FACTORS:
                    if mode == "scaled":
                        spark.conf.set(
                            "spark.sql.shuffle.partitions", str(scaled_partitions(factor))
                        )
                        spark.conf.unset(INITIAL_KEY)
                    elif mode == "aqe512":
                        spark.conf.set("spark.sql.shuffle.partitions", "32")
                        spark.conf.set(INITIAL_KEY, "512")
                    else:
                        spark.conf.set("spark.sql.shuffle.partitions", "32")
                        spark.conf.unset(INITIAL_KEY)
                    walls[factor] = time_op(build, spark, dirs[factor])
                    print(
                        f"{name:20s} {mode:8s} {factor:3d}x "
                        f"wall={walls[factor]:7.2f}s",
                        flush=True,
                    )
                seg = math.log(walls[300] / walls[100]) / math.log(3.0)
                rec[mode] = {
                    "t_100x_sec": round(walls[100], 2),
                    "t_300x_sec": round(walls[300], 2),
                    "seg_exponent_100_300": round(seg, 3),
                }
                print(f"{name:20s} {mode:8s} segment_exp={seg:5.2f}", flush=True)
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            spark.conf.unset(INITIAL_KEY)
            results[name] = rec

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_CURVE.json"
        )
        out = {}
        if os.path.exists(path):
            with open(path) as f:
                out = json.load(f)
        out.setdefault("partition_knee", {"ops": {}})["ops"].update(results)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}", flush=True)
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
