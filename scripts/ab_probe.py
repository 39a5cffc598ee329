"""Interleaved A/B wall-clock probe between two repo checkouts.

Times each named query in a FRESH JVM subprocess per (side, rep) — the
only protocol the r12 sweep-aging finding allows — alternating sides
(A, B, A, B, ...) so box noise hits both sides equally. JIT warm-up on
sf0.001 inside each subprocess, then min-of-2 walls at sf0.1 via the
noop sink (guide §1.4).

Usage:
    python scripts/ab_probe.py --a /root/repo --b /tmp/head_repo \
        [--reps 2] op [op ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WARM = "/root/testdata/sf0.001"
BASE = "/root/testdata/sf0.1"

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from yamon_spark.queries import all_queries
from yamon_spark.session import get_spark

spark = get_spark("ab-probe")
spark.sparkContext.setLogLevel("ERROR")
build = all_queries()[{name!r}].build
build(spark, {warm!r}).write.format("noop").mode("overwrite").save()
walls = []
for _ in range(2):
    t0 = time.monotonic()
    build(spark, {base!r}).write.format("noop").mode("overwrite").save()
    walls.append(time.monotonic() - t0)
print("RESULT " + json.dumps(walls), flush=True)
"""


def run_one(root: str, name: str) -> list[float] | None:
    code = _WORKER.format(root=root, name=name, warm=WARM, base=BASE)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=root,
        env=dict(os.environ, SPARK_GRAFT_SF_DIR=BASE),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        sys.stderr.write(out.stdout[-800:] + "\n" + out.stderr[-800:] + "\n")
        return None
    return json.loads(lines[-1][len("RESULT "):])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--a", default="/root/repo")
    p.add_argument("--b", default="/tmp/head_repo")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("ops", nargs="+")
    args = p.parse_args()
    summary: dict[str, dict[str, float]] = {}
    for name in args.ops:
        mins = {"A": float("inf"), "B": float("inf")}
        for rep in range(args.reps):
            for side, root in (("A", args.a), ("B", args.b)):
                walls = run_one(root, name)
                if walls is None:
                    print(f"{name} {side} rep{rep}: FAILED")
                    continue
                mins[side] = min(mins[side], *walls)
                print(
                    f"{name:26s} {side} rep{rep} walls="
                    f"{[round(w, 2) for w in walls]}",
                    flush=True,
                )
        summary[name] = mins
        if mins["B"] < float("inf"):
            print(
                f">>> {name:24s} A(min)={mins['A']:6.2f}s  "
                f"B(min)={mins['B']:6.2f}s  A/B={mins['A'] / mins['B']:.2f}",
                flush=True,
            )
    print("SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
