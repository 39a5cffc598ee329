"""Dev loop: run every declared query against the DuckDB oracle locally.

Usage: python scripts/dev_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from yamon_spark.oracle import compare_all
from yamon_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    spark = get_spark("dev-check")
    results = compare_all(spark, sf_dir, names)
    n_ok = sum(r.ok for r in results)
    for r in results:
        mark = "PASS" if r.ok else "FAIL"
        print(f"{mark} {r.name:28s} rows={r.spark_rows}/{r.oracle_rows} {r.detail if not r.ok or 'rows-only' in r.detail else ''}")
    print(f"\n{n_ok}/{len(results)} ok")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
