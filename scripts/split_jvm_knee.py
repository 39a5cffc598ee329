"""De-confound the posting-list pair family's 300x knee from single-JVM GC.

SCALE.md records a superlinear 100x->300x wall-time segment for the
posting-list pair ops (dedup_jaccard 43.4 -> 234 s = 5.4x for 3x data)
and attributes it to one 48 g JVM's GC pressure, not candidate blowup:
the synthesized replicas are vocabulary-disjoint, so the pair graph
grows exactly linearly by construction. That attribution was a
hypothesis. This script is the measurement that tests it: re-run the
same ops on the SAME box with the heap split across two worker JVMs
(``local-cluster[2,16,24576]``, 20 g executor heap each) and fit the
100->300 segment exponent ln(t300/t100)/ln(3) per op.

- exponent <= ~1.1 under split JVMs  => the single-heap GC attribution
  holds; on a real cluster (per-executor heaps) the family is linear.
- exponent still ~2 under split JVMs => the knee is algorithmic and the
  `max_doc_freq` stop-shingle cap must become the default.

Results land in SCALE_CURVE.json under a separate ``split_jvm`` key so
the single-JVM ``runs`` record (the per-round evidence base) stays
un-conflated.

Usage: python scripts/split_jvm_knee.py [ops...]   (defaults below)
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

# must be set before the session singleton exists
os.environ["SPARK_GRAFT_MASTER"] = os.environ.get(
    "SPARK_GRAFT_MASTER", "local-cluster[2,16,24576]"
)
os.environ.setdefault("SPARK_EXECUTOR_MEMORY", "20g")
# driver does no heavy lifting here; the point is the split EXECUTOR heap
os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")

BASE = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
DEFAULT_OPS = [
    "dedup_jaccard",
    "dedup_containment",
    "dedup_clusters",
    "dedup_funnel",
    "dedup_source_matrix",
    "dedup_survivors",
]


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

    spark = get_spark("yamon-split-jvm-knee")
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.sparkContext.master.startswith("local-cluster"), spark.sparkContext.master
    qs = all_queries()

    dirs = {}
    results = {}
    try:
        for factor in (100, 300):
            d = tempfile.mkdtemp(prefix=f"yamon_split{factor}x_")
            t0 = time.perf_counter()
            synthesize(spark, BASE, d, factor)
            print(f"synthesized {factor}x in {time.perf_counter() - t0:.1f}s -> {d}", flush=True)
            dirs[factor] = d

        for name in ops:
            build = qs[name].build
            build(spark, WARM).write.format("noop").mode("overwrite").save()  # JIT warm
            t1 = time_op(build, spark, BASE)
            t100 = time_op(build, spark, dirs[100])
            t300 = time_op(build, spark, dirs[300])
            seg = math.log(t300 / t100) / math.log(3.0)
            results[name] = {
                "t_1x_sec": round(t1, 2),
                "t_100x_sec": round(t100, 2),
                "t_300x_sec": round(t300, 2),
                "seg_exponent_100_300": round(seg, 3),
            }
            print(
                f"{name:24s} 1x={t1:6.2f}s 100x={t100:7.2f}s 300x={t300:7.2f}s "
                f"segment_exp={seg:5.2f}",
                flush=True,
            )

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_CURVE.json"
        )
        out = {}
        if os.path.exists(path):
            with open(path) as f:
                out = json.load(f)
        rec = out.setdefault(
            "split_jvm",
            {"master": os.environ["SPARK_GRAFT_MASTER"],
             "executor_memory": os.environ["SPARK_EXECUTOR_MEMORY"],
             "ops": {}},
        )
        rec["ops"].update(results)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}", flush=True)
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
