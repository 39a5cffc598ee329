"""Fresh-JVM 8-vs-32-core evidence pair on a shuffle-heavy op at a
corpus size where the ratio separates (VERDICT r13 item 2): synthesize
a factor-x slice once, then run the op in one fresh subprocess JVM per
(cpus, rep), interleaved (32, 8, 32, 8) so box noise hits both sides.

At sf0.1 every per-query wall is overhead-bound and 8-vs-32 ratios sit
at ~1 (the suspect_cpus_ignored flag); at 100x the posting-list pair
kernel is compute/shuffle-bound and the core count shows — bounded
above by the machine's own concurrency yield (bench cpu_probe: the VM
gives only ~1.8x from local[8] to local[32] on pure compute).

Usage: python scripts/cpus_pair_probe.py [factor] [op]  (default 100 dedup_jaccard)
Prints one JSON line; paste into SCALE.md / plans/r14.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from yamon_spark.queries import all_queries
from yamon_spark.session import get_spark
spark = get_spark("cpus-pair", data_dir={sf_dir!r})
spark.sparkContext.setLogLevel("ERROR")
build = all_queries()[{op!r}].build
build(spark, {warm!r}).write.format("noop").mode("overwrite").save()
t0 = time.perf_counter()
build(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
print("RESULT " + json.dumps(time.perf_counter() - t0), flush=True)
"""


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    op = sys.argv[2] if len(sys.argv) > 2 else "dedup_jaccard"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from scripts.scale_curve import synthesize
    from yamon_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix=f"yamon_cpuspair{factor}x_")
    spark = get_spark("cpus-pair-synth", data_dir=BASE)
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, BASE, tmp, factor)
    spark.stop()
    try:
        walls: dict[str, list[float]] = {"32": [], "8": []}
        for _rep in range(2):
            for cpus in ("32", "8"):
                code = _WORKER.format(repo=repo, sf_dir=tmp, warm=WARM, op=op)
                env = dict(
                    os.environ,
                    SPARK_GRAFT_CPUS=cpus,
                    SPARK_GRAFT_SF_DIR=tmp,
                    SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
                )
                out = subprocess.run(
                    [sys.executable, "-c", code], capture_output=True, text=True,
                    timeout=3600, env=env, cwd=repo,
                )
                lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
                w = float(lines[-1][len("RESULT "):]) if lines else -1.0
                walls[cpus].append(round(w, 2))
                print(f"cpus={cpus} rep wall={w:.2f}s", flush=True)
        m32, m8 = min(walls["32"]), min(walls["8"])
        print("PAIR " + json.dumps({
            "op": op, "factor": factor, "walls_local32": walls["32"],
            "walls_local8": walls["8"], "min_local32": m32, "min_local8": m8,
            "ratio_8_over_32": round(m8 / m32, 2) if m32 > 0 else None,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
