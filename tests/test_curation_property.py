"""Property-based curation invariants (hypothesis):

- Winnowing theorem: two documents sharing a contiguous run of at least
  ngram + window - 1 words MUST share at least one fingerprint — the
  guarantee that makes winnowing usable for partial-overlap detection.
- PII no-leak: after pii_scrub, the scrubbed text contains no substring
  matching any of the scrub patterns (scrubbing is idempotent-complete,
  placeholders don't re-trigger patterns).

Examples are batched into one DataFrame per hypothesis case set to keep
Spark job counts low.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from yamon_spark.operators.curation import PII_PATTERNS, pii_scrub
from yamon_spark.operators.text import winnow_fingerprints

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_word = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
_words = st.lists(_word, min_size=1, max_size=30)

NGRAM, WINDOW = 3, 3
GUARANTEE = NGRAM + WINDOW - 1  # shared run length that must collide


@settings(max_examples=15, deadline=None)
@given(
    prefix_a=_words,
    prefix_b=_words,
    shared=st.lists(_word, min_size=GUARANTEE, max_size=GUARANTEE + 4),
    suffix_a=_words,
    suffix_b=_words,
)
def test_winnowing_shared_run_guarantee(spark, prefix_a, prefix_b, shared, suffix_a, suffix_b):
    doc_a = " ".join(prefix_a + shared + suffix_a)
    doc_b = " ".join(prefix_b + shared + suffix_b)
    docs = spark.createDataFrame(
        [(0, doc_a, "en", "s", len(doc_a)), (1, doc_b, "en", "s", len(doc_b))], DOC_SCHEMA
    )
    fps = winnow_fingerprints(docs, ngram=NGRAM, window=WINDOW).collect()
    a = {r["fingerprint"] for r in fps if r["doc_id"] == 0}
    b = {r["fingerprint"] for r in fps if r["doc_id"] == 1}
    assert a & b, f"no shared fingerprint despite {GUARANTEE}-word shared run"


_pii_fragment = st.sampled_from(
    [
        "mail me at some.user+x@host-name.example.co ok",
        "from 10.20.30.40 and 255.255.255.0 nets",
        "ref 123456789012 and 987654321",
        "call +1 (555) 123-4567 or 555 867 5309 now",
        "plain words only here",
        "",
    ]
)


@settings(max_examples=15, deadline=None)
@given(frags=st.lists(_pii_fragment, min_size=1, max_size=5))
def test_pii_scrub_leaves_no_matches(spark, frags):
    text = " and then ".join(frags)
    docs = spark.createDataFrame([(0, text, "en", "s", len(text))], DOC_SCHEMA)
    out = pii_scrub(docs).collect()[0]
    scrubbed = out["text_scrubbed"]
    for token, pat in PII_PATTERNS:
        assert not re.search(pat, scrubbed), f"{token} pattern still matches: {scrubbed!r}"


@settings(max_examples=10, deadline=None)
@given(
    filler=st.lists(st.text(alphabet="qrstuv", min_size=2, max_size=5), min_size=8, max_size=16),
    extra=st.integers(min_value=1, max_value=3),
)
def test_bm25_tf_monotonic(spark, filler, extra):
    """Within one corpus, a doc with strictly more query-term occurrences
    than an otherwise-identical doc (same length) must score higher —
    BM25's tf term is monotone and idf is always positive."""
    from yamon_spark.operators.text import bm25_scores

    pad = ["pad"] * extra
    doc_hi = " ".join(filler + ["data"] * (1 + extra))
    doc_lo = " ".join(filler + ["data"] + pad)  # same word count, fewer 'data'
    docs = spark.createDataFrame(
        [(1, doc_hi), (2, doc_lo), (3, " ".join(filler))],
        "doc_id bigint, text string",
    )
    scores = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["data"]).collect()}
    assert scores[1] > scores[2]
    assert 3 not in scores  # no term, no row


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.lists(_word, min_size=1, max_size=6)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=20, deadline=None)
def test_dedup_budget_ordering_invariant(spark, docs_spec):
    """For ANY corpus: hard <= count_aware <= raw in token mass, raw doc
    count >= hard doc count, and count_aware == hard iff no group has
    duplicates (1+ln(1) = 1)."""
    import math

    from yamon_spark.operators.dedup import dedup_budget_impact

    rows = [(i, " ".join(ws)) for i, ws in docs_spec]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.policy: r for r in dedup_budget_impact(docs).collect()}
    assert out["hard"].eff_tokens <= out["count_aware"].eff_tokens + 1e-9
    assert out["count_aware"].eff_tokens <= out["raw"].eff_tokens + 1e-9
    assert out["raw"].eff_docs >= out["hard"].eff_docs
    has_dups = out["raw"].eff_docs > out["hard"].eff_docs
    diverges = abs(out["count_aware"].eff_tokens - out["hard"].eff_tokens) > 1e-9
    assert diverges == has_dups


@given(
    st.lists(st.lists(_word, min_size=1, max_size=12), min_size=1, max_size=8),
    st.lists(st.lists(_word, min_size=5, max_size=10), min_size=1, max_size=3),
)
@settings(max_examples=15, deadline=None)
def test_contamination_stamp_bounds_and_verbatim_leak(spark, corpus_words, bench_words):
    """For ANY corpus and benchmark: stamped ratios sit in [0, 1], every
    doc is stamped exactly once, and a doc that IS a benchmark document
    verbatim stamps ratio 1.0."""
    from yamon_spark.operators.curation import benchmark_shingles, contamination_stamp

    bench_rows = [(" ".join(ws),) for ws in bench_words]
    bench = spark.createDataFrame(bench_rows, "text string")
    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpus_words)]
    leak_id = 1000
    rows.append((leak_id, bench_rows[0][0]))  # verbatim benchmark doc
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = contamination_stamp(docs, benchmark_shingles(bench, ngram=5), ngram=5)
    got = out.collect()
    assert len(got) == len(rows)
    for r in got:
        assert 0.0 <= r.contam_ratio <= 1.0
        assert r.contaminated in (0, 1)
    leak = next(r for r in got if r.doc_id == leak_id)
    assert leak.contam_ratio == 1.0 and leak.contaminated == 1
