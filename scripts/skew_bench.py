"""Measured evidence for the hot-key salted join (operators/skew.py).

salted_join exists for exactly one reason: wall-time under skew when AQE
can't re-plan (AQE off, or a non-sort-merge shape AQE skew-split doesn't
reach). Its correctness is pinned by tests/test_scale_ops.py; this
script measures the reason to exist — a synthetic 90%-hot-key probe at
~10x the sf0.1 row scale, joined plain vs salted under a session with
AQE and auto-broadcast DISABLED (the environment the operator is for).

The hot reducer serializes the plain shuffle join: one task gets 90% of
the probe. Salting spreads the hot key across `salt` reducers.

Usage: python scripts/skew_bench.py [n_rows] [salt]
Prints one JSON line; paste the numbers into SCALE.md's skew section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    salt = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from yamon_spark.operators.skew import salted_join

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "false")  # the no-AQE regime
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("yamon-skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 90% of probe rows share host-0; the rest spread over 999 hosts
    probe = spark.range(n_rows).select(
        F.when(F.col("id") % 10 < 9, "host-0")
        .otherwise(F.concat(F.lit("host-"), (F.col("id") % 999).cast("string")))
        .alias("host"),
        (F.col("id") % 10_000).cast("double").alias("v"),
    )
    build = spark.range(1000).select(
        F.concat(F.lit("host-"), F.col("id").cast("string")).alias("host"),
        F.concat(F.lit("dc-"), (F.col("id") % 7).cast("string")).alias("dc"),
    )

    def timed(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm-up (codegen/JIT) on a small slice
    timed(probe.limit(10_000).join(build, "host"))
    timed(salted_join(probe.limit(10_000), build, ["host"], salt=salt))

    plain = min(timed(probe.join(build, "host")) for _ in range(2))
    salted = min(timed(salted_join(probe, build, ["host"], salt=salt)) for _ in range(2))

    print(
        json.dumps(
            {
                "n_probe_rows": n_rows,
                "hot_key_share": 0.9,
                "salt": salt,
                "plain_shuffle_join_sec": round(plain, 2),
                "salted_join_sec": round(salted, 2),
                "speedup": round(plain / salted, 2) if salted else None,
                "regime": "AQE off, auto-broadcast off, 32 shuffle partitions",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
