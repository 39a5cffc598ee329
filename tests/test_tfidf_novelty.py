"""Unit tests for the round-6 curation additions: posting-list TF-IDF
pairs, 8-gram novelty, and deterministic weighted sampling
(operators/text.py::tfidf_pairs, ngram_novelty;
operators/curation.py::sample_weighted)."""

from __future__ import annotations

import math

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(rows)], DOC_SCHEMA
    )


def test_tfidf_identical_docs_cosine_one(spark):
    from yamon_spark.operators.text import tfidf_pairs

    docs = _docs(spark, ["alpha beta gamma", "alpha beta gamma", "zeta eta theta"])
    got = {(r.doc_a, r.doc_b): r.cosine for r in tfidf_pairs(docs).collect()}
    # identical weight vectors -> cosine exactly 1.0; the disjoint doc
    # shares no term with df >= 2, so it pairs with nothing
    assert got == {(0, 1): 1.0}


def test_tfidf_df_max_prunes_stop_terms(spark):
    from yamon_spark.operators.text import tfidf_pairs

    # 'the' appears in all three docs; with df_max=2 it is pruned, and the
    # only surviving shared term is 'shared' (df=2)
    docs = _docs(spark, ["the shared one", "the shared two", "the other three"])
    got = tfidf_pairs(docs, df_max=2).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(0, 1)]
    # one shared term with equal tf -> weight vectors are parallel on the
    # shared axis; cosine = wa*wb / (|wa|*|wb|) = 1.0
    assert got[0].cosine == 1.0


def test_tfidf_hand_computed_cosine(spark):
    from yamon_spark.operators.text import tfidf_pairs

    # doc0: a b ; doc1: a c ; doc2: b c  — every term has df=2
    docs = _docs(spark, ["a b", "a c", "b c"])
    got = {(r.doc_a, r.doc_b): r.cosine for r in tfidf_pairs(docs, threshold=0.0).collect()}
    # all idf_q equal (df=2, N=3): q = round(ln(1.5)*1000) = 405; each doc
    # vector has two weight-q axes, sharing exactly one -> cos = q^2/(2q^2)
    assert got == {(0, 1): 0.5, (0, 2): 0.5, (1, 2): 0.5}


def test_ngram_novelty_first_doc_owns_everything(spark):
    from yamon_spark.operators.text import ngram_novelty

    ten = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    docs = _docs(spark, [ten, ten, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"])
    rows = {r.doc_id: r for r in ngram_novelty(docs, ngram=8).collect()}
    # 10 words -> 3 distinct 8-grams per doc
    assert all(rows[i].n_shingles == 3 for i in range(3))
    assert (rows[0].n_novel, rows[0].novelty) == (3, 1.0)   # first owner
    assert (rows[1].n_novel, rows[1].novelty) == (0, 0.0)   # exact dup
    assert (rows[2].n_novel, rows[2].novelty) == (3, 1.0)   # fresh content


def test_ngram_novelty_short_doc_tail_contract(spark):
    from yamon_spark.operators.text import ngram_novelty

    # shorter than the shingle width: ONE short shingle (FIXTURES contract)
    docs = _docs(spark, ["just two"])
    rows = ngram_novelty(docs, ngram=8).collect()
    assert [(r.n_shingles, r.n_novel, r.novelty) for r in rows] == [(1, 1, 1.0)]


def test_sample_weighted_deterministic_and_sized(spark):
    from yamon_spark.operators.curation import sample_weighted

    docs = _docs(spark, [f"doc number {i} " + "pad " * (i % 7) for i in range(40)])
    a = [r.doc_id for r in sample_weighted(docs, n=10).collect()]
    b = [r.doc_id for r in sample_weighted(docs, n=10).collect()]
    assert a == b and len(a) == 10 and a == sorted(a)
    # a different salt re-deals the sample
    c = [r.doc_id for r in sample_weighted(docs, n=10, salt="other").collect()]
    assert c != a


def test_sample_weighted_matches_reference_formula(spark):
    """Top-n by ln(u)/w computed independently in Python must agree."""
    import hashlib

    from yamon_spark.operators.curation import sample_weighted

    texts = [f"t{i} " + "x" * (5 * i) for i in range(30)]
    docs = _docs(spark, texts)
    keys = {}
    for i, t in enumerate(texts):
        h = int(hashlib.md5(f"{i}:aes".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        keys[i] = math.log(u) / max(len(t), 1)
    expect = sorted(sorted(keys, key=lambda d: (-keys[d], d))[:5])
    got = [r.doc_id for r in sample_weighted(docs, n=5).collect()]
    assert got == expect


def test_count_min_sketch_guarantee_and_exactness(spark):
    """CMS invariants on a crafted stream: est >= exact for every word
    (one-sided error), a word with no colliding buckets estimates
    EXACTLY, and counters are reproducible (same hash idiom both
    calls)."""
    from yamon_spark.operators.text import count_min_sketch

    text = " ".join(["alpha"] * 20 + ["beta"] * 10 + [f"tail{i}" for i in range(30)])
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = {r.word: r for r in count_min_sketch(docs, width=64, depth=4, top_n=50).collect()}
    assert out["alpha"].exact_n == 20 and out["beta"].exact_n == 10
    for r in out.values():
        assert r.est_n >= r.exact_n and r.overcount == r.est_n - r.exact_n
    again = {r.word: r.est_n for r in count_min_sketch(docs, width=64, depth=4, top_n=50).collect()}
    assert again == {w: r.est_n for w, r in out.items()}


def test_mattr_length_robust_and_flags_templates(spark):
    """MATTR's reason to exist: a looping template scores low at any
    length while diverse text scores high, and (unlike plain TTR) the
    diverse score does NOT collapse as the doc grows. Short docs fall
    back to TTR with windowed=0; closed form pinned for the constant
    doc."""
    from yamon_spark.operators.text import mattr

    template = ("alpha beta gamma " * 40).strip()      # 120 words, 3 types
    diverse = " ".join(f"w{i}" for i in range(120))     # 120 words, all distinct
    diverse_long = " ".join(f"w{i}" for i in range(600))
    short = "just five little words here"
    docs = spark.createDataFrame(
        [(0, template), (1, diverse), (2, diverse_long), (3, short)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in mattr(docs, window=25).collect()}
    assert out[0].windowed == 1 and out[0].mattr == round(3 / 25, 4)  # every window: 3 types
    assert out[1].mattr == 1.0 and out[2].mattr == 1.0  # diversity stable with length
    assert out[3].windowed == 0 and out[3].mattr == 1.0  # TTR fallback
    assert out[0].mattr < 0.2 < out[1].mattr
