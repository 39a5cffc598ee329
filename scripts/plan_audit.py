"""Plan-shape audit over the whole declared-query registry.

SCALE.md argues each operator's 100 TB story from its physical plan;
this script makes that argument machine-checkable: for every registered
query it records the executed plan's shuffle count (Exchange), join
strategies (broadcast-hash / sort-merge / broadcast-nested-loop),
Python execution nodes (Arrow-batched vs row-at-a-time), scan pushdown
(PushedFilters non-empty), and whole-stage-codegen span count — then
writes PLAN_AUDIT.json and prints the aggregate.

The per-query rows let a reviewer answer, without rereading the code:
which queries shuffle more than twice? which joins fell back to
sort-merge? did any Python sneak into a hot path row-at-a-time?

Usage: python scripts/plan_audit.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# Unpartitioned Window nodes whose input is PROVABLY bounded (row count is a
# constant independent of corpus size). Any unpartitioned window NOT in this
# map is data-sized — the whole table funnels through one task — and fails
# the gate below. The map itself lives in the package (importable without
# this script's top-level side effects) so the CI twin in
# tests/test_plans.py loads the identical object.
from yamon_spark.plans.audit_whitelist import BOUNDED_WINDOW_WHITELIST  # noqa: E402


def audit_plan(plan: str) -> dict:
    return {
        # negative lookbehind: "BroadcastExchange" must not count as a
        # shuffle — only hash/range/single-partition exchanges move data
        "exchanges": len(re.findall(r"(?<!Broadcast)Exchange ", plan)),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "bnl_joins": plan.count("BroadcastNestedLoopJoin"),
        "arrow_python": sum(plan.count(t) for t in (
            "ArrowEvalPython", "MapInArrow", "FlatMapGroupsInArrow",
            "MapInPandas", "FlatMapGroupsInPandas", "AggregateInPandas",
        )),
        "row_python": plan.count("BatchEvalPython"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        # executedPlan().toString() renders codegen regions as "*(N)" prefixes
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "unpartitioned_windows": sum(
            1 for line in plan.splitlines() if _is_unpartitioned_window(line)
        ),
    }


def _is_unpartitioned_window(line: str) -> bool:
    """True when a physical-plan Window line has an EMPTY partition spec
    (WindowExec's "No Partition Defined" warning: ALL rows move to one
    partition). Renderings:
      unpartitioned + ordered:  Window [funcs], [ord ASC/DESC ...]
      partitioned + ordered:    Window [funcs], [part], [ord ...]
      partitioned, no order:    Window [funcs], [part]      (NO warning)
    so unpartitioned = exactly one "], [" separator whose trailing group
    is an ORDER spec (contains ASC/DESC), or an empty trailing spec."""
    if "Window [" not in line or line.count("], [") != 1:
        return False
    trailing = line.rsplit("], [", 1)[1]
    return bool(re.search(r"\b(ASC|DESC)\b", trailing)) or trailing.strip() == "]"


def main() -> None:
    from yamon_spark.queries import all_queries
    from yamon_spark.session import get_spark

    spark = get_spark("yamon-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, dq in sorted(all_queries().items()):
        try:
            plan = dq.build(spark, SF)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:160]
            continue
        rows[name] = audit_plan(plan)

    n = len(rows)
    summary = {
        "queries": n,
        "errors": len(errors),
        "row_python_total": sum(r["row_python"] for r in rows.values()),
        "max_exchanges": max((r["exchanges"] for r in rows.values()), default=0),
        "over_3_exchanges": sorted(
            k for k, r in rows.items() if r["exchanges"] > 3
        ),
        "sort_merge_joins": sorted(k for k, r in rows.items() if r["sort_merge_joins"]),
        "bnl_joins": sorted(k for k, r in rows.items() if r["bnl_joins"]),
        "unpartitioned_windows": sorted(
            k for k, r in rows.items() if r["unpartitioned_windows"]
        ),
    }
    # Hard gate: every unpartitioned window must be whitelisted as bounded.
    summary["data_sized_unpartitioned_windows"] = sorted(
        k for k in summary["unpartitioned_windows"]
        if k not in BOUNDED_WINDOW_WHITELIST
    )
    summary["bounded_window_whitelist"] = BOUNDED_WINDOW_WHITELIST
    # Stale-entry gate: a whitelist row whose query no longer carries an
    # unpartitioned window is a rotting excuse — it would silently cover a
    # FUTURE data-sized window landing under the same name. Remove it.
    summary["stale_window_whitelist"] = sorted(
        k for k in BOUNDED_WINDOW_WHITELIST
        if k not in summary["unpartitioned_windows"]
    )
    out = {"sf_dir": SF, "summary": summary, "per_query": rows}
    if errors:
        out["build_errors"] = errors
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1))
    print(f"wrote {path}")
    if summary["data_sized_unpartitioned_windows"]:
        print(
            "GATE FAIL: data-sized single-partition window(s): "
            + ", ".join(summary["data_sized_unpartitioned_windows"]),
            file=sys.stderr,
        )
        sys.exit(1)
    if summary["stale_window_whitelist"]:
        print(
            "GATE FAIL: stale bounded-window whitelist entr(ies): "
            + ", ".join(summary["stale_window_whitelist"]),
            file=sys.stderr,
        )
        sys.exit(1)
    bad_fresh = superlinear_fresh_exponents()
    if bad_fresh:
        print(
            "GATE FAIL: fresh-protocol scale exponent(s) above "
            f"{FRESH_EXPONENT_CAP}: "
            + ", ".join(f"{k}={v}" for k, v in sorted(bad_fresh.items())),
            file=sys.stderr,
        )
        sys.exit(1)


# The r12 de-confounding result as a standing invariant: every
# fresh-protocol (one-JVM-per-op) scale exponent measured landed 0.3-1.3,
# bracketing linear. A fresh exponent above this cap means an operator's
# wall genuinely grows superlinearly with corpus size — a 100-TB design
# failure, not measurement noise (the aged `exponents` table is NOT
# gated: warm-sweep walls inflate with session age and would false-alarm).
FRESH_EXPONENT_CAP = 1.3


def superlinear_fresh_exponents(path: str | None = None) -> dict[str, float]:
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_CURVE.json"
        )
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        curve = json.load(f)
    return {
        name: rec["exponent"]
        for name, rec in curve.get("fresh_exponents", {}).items()
        if rec.get("exponent", 0) > FRESH_EXPONENT_CAP
    }


if __name__ == "__main__":
    main()
