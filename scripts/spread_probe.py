"""Quantify the 1-task-scan serialization on map-heavy text operators.

For each named operator, times `op(docs)` vs `op(docs.repartition(N,
"doc_id"))` in a FRESH JVM per (variant, rep) — interleaved like
ab_probe so box noise hits both variants equally. The question: does
spreading the raw text before the per-row HOF/regex compute pay for its
shuffle (the shingle_table `_spread` rationale) on ops that currently
ride a single scan task locally?

Usage: python scripts/spread_probe.py [--reps 2] op [op ...]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

WARM = "/root/testdata/sf0.001"
BASE = "/root/testdata/sf0.1"

# operator name -> (module, callable) taking a docs frame
OPS = {
    "char_entropy": ("yamon_spark.operators.text", "char_entropy"),
    "winnow_fingerprints": ("yamon_spark.operators.text", "winnow_fingerprints"),
    "text_mattr": ("yamon_spark.operators.text", "mattr"),
    "pii_scrub": ("yamon_spark.operators.curation", "pii_scrub"),
    "contamination_check": ("yamon_spark.operators.curation", "contamination_check"),
    "text_stats": ("yamon_spark.operators.text", "text_stats"),
}

_WORKER = r"""
import importlib, json, time
from pyspark.sql import functions as F
from yamon_spark.queries import table
from yamon_spark.session import get_spark

spark = get_spark("spread-probe", data_dir={base!r})
spark.sparkContext.setLogLevel("ERROR")
op = getattr(importlib.import_module({mod!r}), {fn!r})

def run(sf_dir):
    docs = table(spark, sf_dir, "documents")
    if {spread!r} == "yes":
        docs = docs.repartition(32, "doc_id")
    op(docs).write.format("noop").mode("overwrite").save()

run({warm!r})
walls = []
for _ in range(2):
    t0 = time.monotonic()
    run({base!r})
    walls.append(time.monotonic() - t0)
print("RESULT " + json.dumps(walls), flush=True)
"""


def run_one(name: str, spread: str) -> list[float] | None:
    mod, fn = OPS[name]
    code = _WORKER.format(mod=mod, fn=fn, spread=spread, warm=WARM, base=BASE)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=900,
        cwd="/root/repo",
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        sys.stderr.write(out.stdout[-500:] + "\n" + out.stderr[-500:] + "\n")
        return None
    return json.loads(lines[-1][len("RESULT "):])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("ops", nargs="+")
    args = p.parse_args()
    summary = {}
    for name in args.ops:
        mins = {"plain": float("inf"), "spread": float("inf")}
        for rep in range(args.reps):
            for label, sp in (("plain", "no"), ("spread", "yes")):
                walls = run_one(name, sp)
                if walls is None:
                    print(f"{name} {label} rep{rep}: FAILED")
                    continue
                mins[label] = min(mins[label], *walls)
                print(f"{name:22s} {label:6s} rep{rep} walls={[round(w,2) for w in walls]}", flush=True)
        summary[name] = mins
        if mins["plain"] < float("inf") and mins["spread"] < float("inf"):
            print(f">>> {name:20s} plain={mins['plain']:6.2f}s spread={mins['spread']:6.2f}s  spread/plain={mins['spread']/mins['plain']:.2f}", flush=True)
    print("SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
