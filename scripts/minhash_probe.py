"""Isolate the minhash-family bench regression: aqe512 vs fixed32.

BENCH_r12 showed dedup_minhash_lsh 2.16->4.88 s and dedup_minhash_err
4.39->6.54 s vs r11 — the only consistent per-query regression, and the
prime suspect is the r12 session default
``spark.sql.adaptive.coalescePartitions.initialPartitionNum=512``
(yamon_spark/session.py): minhash at sf0.1 is a chain of SMALL shuffles
(16-signature explode -> band buckets -> candidate join -> verify join),
and a 512-wide start pays per-partition scheduling + AQE-coalesce
overhead on every one of them while the data never justifies the width.
The r12 sf0.1 "free at small scale" probe covered 6 queries that did
not include this family.

Protocol (the only one r12's own findings allow): ONE op per fresh JVM
subprocess per mode — a long shared session ages the heap and fakes
regressions (SCALE.md "Round 12", memory: sweep-session aging). JIT
warm-up on sf0.001, then min-of-2 walls at sf0.1.

Usage: python scripts/minhash_probe.py [ops...]
Prints per-(mode, op) walls and a verdict line; records nothing —
the resolution (per-op conf, input-sized default, or accept+document)
is a code/SCALE.md change, not an artifact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"
MODES = {"aqe512": "512", "fixed32": "off"}
DEFAULT_OPS = ["dedup_minhash_lsh", "dedup_minhash_err"]


def _worker(name: str) -> None:
    import time

    from yamon_spark.queries import all_queries
    from yamon_spark.session import get_spark

    spark = get_spark("minhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build = all_queries()[name].build
    build(spark, WARM).write.format("noop").mode("overwrite").save()  # JIT warm
    walls = []
    for _ in range(2):
        t0 = time.monotonic()
        build(spark, BASE).write.format("noop").mode("overwrite").save()
        walls.append(time.monotonic() - t0)
    print("RESULT " + json.dumps({"walls": walls}), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        _worker(sys.argv[2])
        return
    ops = sys.argv[1:] or DEFAULT_OPS
    results: dict[str, dict[str, float]] = {}
    for name in ops:
        for mode, init in MODES.items():
            env = dict(os.environ, SPARK_GRAFT_INIT_PARTITIONS=init)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                env=env,
                capture_output=True,
                text=True,
                timeout=600,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                print(f"{name} {mode}: FAILED\n{out.stdout[-500:]}\n{out.stderr[-500:]}")
                continue
            walls = json.loads(line[-1][len("RESULT "):])["walls"]
            results.setdefault(name, {})[mode] = min(walls)
            print(f"{name:20s} {mode:8s} min={min(walls):5.2f}s walls={[round(w,2) for w in walls]}")
    for name, modes in results.items():
        if len(modes) == 2:
            ratio = modes["aqe512"] / modes["fixed32"]
            print(f"VERDICT {name}: aqe512/fixed32 = {ratio:.2f}x")


if __name__ == "__main__":
    main()
