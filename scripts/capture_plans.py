"""Capture .explain('formatted') output for declared queries into
plans/<round>/<query>_<suffix>.txt — the optimization round's plan
evidence (judge-checkable without running Spark).

Usage:
    python scripts/capture_plans.py [--round rNN] <suffix> <query> [...]
    python scripts/capture_plans.py before dedup_minhash_err dedup_funnel

The session is the bench session (get_spark with the bench data dir) so
the captured initial plan matches what bench.py times. AQE means the
printed plan is the INITIAL one (isFinalPlan=false); shapes (Exchange
count, join strategy, PushedFilters, Python eval nodes) are what we
assert on.

Every dump is stamped with the git SHA it was captured at (r13 lesson:
a "before" plan captured after part of the change landed is
unreproducible evidence — the stamp makes each file self-identifying).
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yamon_spark.queries import all_queries
from yamon_spark.session import get_spark

ROUND = "r14"


def main() -> None:
    args = sys.argv[1:]
    rnd = ROUND
    if args and args[0] == "--round":
        rnd = args[1]
        args = args[2:]
    suffix = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    try:
        sha = subprocess.run(
            ["git", "-C", repo, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        dirty = bool(
            subprocess.run(
                ["git", "-C", repo, "status", "--porcelain", "--", "yamon_spark"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
        )
        stamp = f"-- captured at commit {sha}{' (+ uncommitted yamon_spark changes)' if dirty else ''}\n"
    except Exception:  # noqa: BLE001 — the stamp is provenance, never a blocker
        stamp = "-- captured at unknown commit\n"
    spark = get_spark("yamon-capture-plans", data_dir=sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        df = qs[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(stamp + plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
