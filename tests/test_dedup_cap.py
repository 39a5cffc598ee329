"""The defaulted stop-shingle cap (dedup.DEFAULT_MAX_DOC_FREQ):

1. INERT at the verification SFs — the default-capped jaccard /
   containment output is byte-identical to the uncapped (None) run on
   the fixture corpus, so every DuckDB oracle hash is unchanged (the
   fixtures' max shingle doc-frequency is 25 at sf0.1, measured, vs the
   1024 cap; the scale-sweep replicas are vocabulary-disjoint so df
   never grows with the factor either).
2. BOUNDING on a boilerplate corpus — a planted hot shingle shared by
   every doc generates the quadratic pair set uncapped and ZERO pairs
   capped, while rare-shingle pairs pass through untouched, and the
   jaccard denominator still counts dropped shingles (underestimate,
   never overestimate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_default_cap_is_inert_on_fixtures_jaccard(spark):
    from yamon_spark.operators.dedup import ngram_jaccard_pairs

    capped = ngram_jaccard_pairs(_docs(spark)).collect()
    uncapped = ngram_jaccard_pairs(_docs(spark), max_doc_freq=None).collect()
    assert capped == uncapped and len(capped) > 0


def test_default_cap_is_inert_on_fixtures_containment(spark):
    from yamon_spark.operators.dedup import ngram_containment_pairs

    capped = ngram_containment_pairs(_docs(spark)).collect()
    uncapped = ngram_containment_pairs(_docs(spark), max_doc_freq=None).collect()
    assert capped == uncapped


def test_cap_drops_hot_shingle_pairs_and_keeps_rare_ones(spark):
    from yamon_spark.operators.dedup import _pair_counts, shingle_table

    # 40 docs, ALL sharing one boilerplate sentence (df=40); docs 0 and 1
    # additionally share a rare trigram (df=2)
    boiler = "all rights reserved by the hosting provider today"
    rows = [
        (i, f"{boiler} unique{i} token{i} filler{i}" + (" shared rare trigram" if i < 2 else ""))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = shingle_table(docs, 3)

    uncapped = _pair_counts(sh, None)
    capped = _pair_counts(sh, 10)
    # uncapped: the hot shingles alone connect all 40*39/2 pairs
    assert uncapped.count() == 40 * 39 // 2
    # capped at 10: only the rare-trigram pair survives...
    rows_c = capped.collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows_c] == [(0, 1)]
    # ...and its n_sh sizes still count the DROPPED boilerplate shingles
    # (denominators unchanged -> jaccard under-, never over-estimated)
    full_sizes = {
        r["doc_id"]: r["n_sh"]
        for r in sh.select("doc_id", "n_sh").distinct().collect()
    }
    assert rows_c[0]["na"] == full_sizes[0] and rows_c[0]["nb"] == full_sizes[1]


def test_auto_resolves_to_shared_default(spark):
    from yamon_spark.operators import dedup

    assert dedup._resolve_cap("auto") == dedup.DEFAULT_MAX_DOC_FREQ
    assert dedup._resolve_cap(None) is None
    assert dedup._resolve_cap(7) == 7


def test_resolve_cap_rejects_typos():
    import pytest

    from yamon_spark.operators import dedup

    for bad in ("Auto", "1024", 0, -5, 3.5, True):
        with pytest.raises(ValueError):
            dedup._resolve_cap(bad)
