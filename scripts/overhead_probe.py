"""Decompose per-query wall time into build / plan / execute, and count
Spark jobs — the r14 fixed-overhead investigation (VERDICT r13 item 1:
~0.4-0.6 s x 216 queries of per-query overhead is half the sweep).

Modes:
  python scripts/overhead_probe.py decompose [query ...]
      For each query (default: a cheap/mid basket), after sf0.001 JIT
      warm-up, measure at the bench SF:
        t_build  — Python DataFrame construction (py4j + analysis)
        t_plan   — force optimization + physical planning (executedPlan)
        t_exec   — noop-sink write (job scheduling + tasks + AQE)
        n_jobs   — Spark jobs launched by the exec step
      min-of-3 per phase, run in ONE bench-style session.

  python scripts/overhead_probe.py sweep
      Decompose ALL registered queries once (build vs exec only,
      single-pass — coarse but complete); prints per-family and total
      attribution.

  python scripts/overhead_probe.py conf <key=val> [<key=val> ...] -- [query ...]
      In-JVM interleaved A/B of runtime-settable SQL confs: run each
      query alternating baseline/override, min-of-2 each, same JVM so
      box noise hits both sides. Only works for runtime-settable confs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yamon_spark.queries import all_queries
from yamon_spark.session import get_spark

WARM = "/root/testdata/sf0.001"
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_BASKET = [
    "q68_cohort_retention",   # 0.45 s — cheapest shape (scan/agg/sort)
    "q30_topk_per_group",     # 0.48 s — window + sort
    "q11_left_outer_count",   # 0.50 s — join
    "text_quality_filter",    # 0.57 s — HOF projection
    "q36_dist_windows",       # 1.18 s — mid window
    "dedup_jaccard",          # 2.10 s — heavy (posting-list kernel)
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def decompose(names: list[str]) -> None:
    spark = get_spark("overhead-probe", data_dir=BASE)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        _noop(qs[name].build(spark, WARM))  # JIT warm-up
        best = {"build": 9e9, "plan": 9e9, "exec": 9e9}
        jobs = 0
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name].build(spark, BASE)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # noqa: SLF001
            t2 = time.perf_counter()
            j0 = tracker.getJobIdsForGroup(None)
            _noop(df)
            t3 = time.perf_counter()
            jobs = len(tracker.getJobIdsForGroup(None)) - len(j0)
            best["build"] = min(best["build"], t1 - t0)
            best["plan"] = min(best["plan"], t2 - t1)
            best["exec"] = min(best["exec"], t3 - t2)
        print(
            f"{name:28s} build={best['build']:.3f} plan={best['plan']:.3f} "
            f"exec={best['exec']:.3f} jobs={jobs}",
            flush=True,
        )


def sweep() -> None:
    spark = get_spark("overhead-sweep", data_dir=BASE)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in sorted(qs):  # JIT warm-up, same as bench
        try:
            _noop(qs[name].build(spark, WARM))
        except Exception:  # noqa: BLE001
            pass
    tracker = spark.sparkContext.statusTracker()
    rows = []
    for name in sorted(qs):
        t0 = time.perf_counter()
        df = qs[name].build(spark, BASE)
        t1 = time.perf_counter()
        j0 = tracker.getJobIdsForGroup(None)
        _noop(df)
        t2 = time.perf_counter()
        n_jobs = len(tracker.getJobIdsForGroup(None)) - len(j0)
        rows.append((name, t1 - t0, t2 - t1, n_jobs))
        print(f"{name:32s} build={t1-t0:6.3f} exec={t2-t1:6.3f} jobs={n_jobs}", flush=True)
    tb = sum(r[1] for r in rows)
    te = sum(r[2] for r in rows)
    tj = sum(r[3] for r in rows)
    print(f"TOTAL build={tb:.1f}s exec={te:.1f}s jobs={tj} over {len(rows)} queries")
    with open("/tmp/overhead_sweep.json", "w") as f:
        json.dump([{"name": n, "build": b, "exec": e, "jobs": j} for n, b, e, j in rows], f)


def conf_ab(overrides: dict[str, str], names: list[str]) -> None:
    spark = get_spark("overhead-conf-ab", data_dir=BASE)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    base_vals = {k: spark.conf.get(k, None) for k in overrides}

    def set_side(on: bool) -> None:
        for k, v in overrides.items():
            if on:
                spark.conf.set(k, v)
            elif base_vals[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, base_vals[k])

    for name in names:
        _noop(qs[name].build(spark, WARM))
        mins = {"base": 9e9, "over": 9e9}
        for _rep in range(2):
            for side in ("base", "over"):
                set_side(side == "over")
                t0 = time.perf_counter()
                _noop(qs[name].build(spark, BASE))
                mins[side] = min(mins[side], time.perf_counter() - t0)
        set_side(False)
        print(
            f"{name:28s} base={mins['base']:.3f} over={mins['over']:.3f} "
            f"over/base={mins['over'] / mins['base']:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "decompose"
    if mode == "decompose":
        decompose(sys.argv[2:] or DEFAULT_BASKET)
    elif mode == "sweep":
        sweep()
    elif mode == "conf":
        rest = sys.argv[2:]
        sep = rest.index("--") if "--" in rest else len(rest)
        overrides = dict(kv.split("=", 1) for kv in rest[:sep])
        names = rest[sep + 1:] or DEFAULT_BASKET
        conf_ab(overrides, names)
    else:
        raise SystemExit(f"unknown mode {mode}")
