"""Measure the stop-shingle cap's two claims (dedup.DEFAULT_MAX_DOC_FREQ):

1. INERT on the fixture corpus: capped-default vs uncapped jaccard
   output identical (count + wall within noise) at sf0.1 — the oracle
   surface is untouched.
2. BOUNDING on a boilerplate corpus: plant one shared boilerplate
   sentence into a fraction of a synthetic corpus (the scraped-web
   shape: license headers, nav bars) and compare pair-expansion rows
   and wall capped vs uncapped. Uncapped pair work grows with
   (hot_docs)^2; capped stays at the rare-shingle level.

Usage: python scripts/stop_shingle_bench.py [n_docs] [hot_frac]
Prints one human line per measurement; paste into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def wall(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3

    from pyspark.sql import functions as F

    from yamon_spark.operators.dedup import (
        DEFAULT_MAX_DOC_FREQ,
        _pair_counts,
        ngram_jaccard_pairs,
        shingle_table,
    )
    from yamon_spark.session import get_spark

    spark = get_spark("stop-shingle-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # claim 1: inert on the fixtures
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet")).select("doc_id", "text")
    for _ in range(2):  # warm
        ngram_jaccard_pairs(docs).write.format("noop").mode("overwrite").save()
    t_capped = min(wall(ngram_jaccard_pairs(docs)) for _ in range(2))
    t_uncapped = min(wall(ngram_jaccard_pairs(docs, max_doc_freq=None)) for _ in range(2))
    n_capped = ngram_jaccard_pairs(docs).count()
    n_uncapped = ngram_jaccard_pairs(docs, max_doc_freq=None).count()
    print(
        f"fixtures sf0.1: capped {t_capped:.2f}s/{n_capped} pairs, "
        f"uncapped {t_uncapped:.2f}s/{n_uncapped} pairs "
        f"(identical={n_capped == n_uncapped})"
    )

    # claim 2: bounding under planted boilerplate. Unique filler tokens
    # per doc keep the rare-shingle graph empty; the ONLY pair mass is
    # the boilerplate sentence shared by hot_frac of the corpus.
    boiler = "all rights reserved by the hosting provider contact support for removal requests"
    synth = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % int(1 / hot_frac) == 0, F.lit(boiler + " ")).otherwise(F.lit("")),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"tok{j}_"), F.col("id").cast("string"))
                    for j in range(20)
                ],
            ),
        ).alias("text"),
    )
    sh = shingle_table(synth, 3)
    n_hot = n_docs * hot_frac
    for cap, label in ((None, "uncapped"), (DEFAULT_MAX_DOC_FREQ, f"capped@{DEFAULT_MAX_DOC_FREQ}")):
        t0 = time.perf_counter()
        n_pairs = _pair_counts(sh, cap).count()
        print(
            f"boilerplate n={n_docs} hot={hot_frac:.0%} ({n_hot:.0f} docs): "
            f"{label} pair rows={n_pairs} wall={time.perf_counter() - t0:.2f}s"
        )


if __name__ == "__main__":
    main()
