"""Capture .explain('formatted') output for declared queries into
plans/r13/<query>_<suffix>.txt — the optimization round's plan evidence
(judge-checkable without running Spark).

Usage:
    python scripts/capture_plans.py <suffix> <query> [<query> ...]
    python scripts/capture_plans.py before dedup_minhash_err dedup_funnel

The session is the bench session (get_spark with the bench data dir) so
the captured initial plan matches what bench.py times. AQE means the
printed plan is the INITIAL one (isFinalPlan=false); shapes (Exchange
count, join strategy, PushedFilters, Python eval nodes) are what we
assert on.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yamon_spark.queries import all_queries
from yamon_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
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
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
