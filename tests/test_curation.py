"""Corpus-curation operators: semantics on crafted micro-corpora plus the
physical-plan invariants that make them 100 TB-safe (shuffle-free gates,
broadcast benchmark/vocab sides, bounded CC iteration).

Oracle parity for all of these runs in test_oracle.py via the registry;
here we pin behaviors an oracle diff can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yamon_spark.operators.curation import (
    contamination_check,
    dedup_canonical,
    dedup_clusters,
    domain_mix,
    pack_sequences,
    quality_filter,
    repetition_stats,
    sample_hash,
    stratified_sample,
    vocab_coverage,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)], DOC_SCHEMA
    )


def test_quality_filter_rules_and_first_reason(spark):
    docs = _docs(
        spark,
        [
            ("the quick brown fox jumps over a lazy dog and runs far away", "en", "s"),
            ("tiny", "en", "s"),  # too_short fires before no_stopwords
            ("zz " * 12 + "zz", "en", "s"),  # 13 words, no stopwords
        ],
    )
    out = {r["doc_id"]: r for r in quality_filter(docs).collect()}
    assert out[0]["keep"] == 1 and out[0]["reason"] == "ok"
    assert out[1]["keep"] == 0 and out[1]["reason"] == "too_short"
    assert out[2]["keep"] == 0 and out[2]["reason"] == "no_stopwords"


def test_quality_and_repetition_are_shuffle_free(spark):
    docs = _docs(spark, [("a b c a b c a b", "en", "s")])
    for op in (quality_filter, repetition_stats):
        plan = op(docs)._jdf.queryExecution().executedPlan().toString()
        # orderBy is the only exchange-producing step and only for output
        # determinism; the feature computation itself must not shuffle
        assert plan.count("Exchange hashpartitioning") == 0, plan


def test_repetition_flags_boilerplate(spark):
    docs = _docs(
        spark,
        [
            ("spam spam spam spam spam spam spam spam spam", "en", "s"),  # 1 distinct 3-gram
            ("one two three four five six seven eight nine", "en", "s"),  # all distinct
        ],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[0]["repetitive"] == 1 and out[0]["n_distinct"] == 1
    assert out[1]["repetitive"] == 0 and out[1]["rep_ratio"] == 0.0


def test_contamination_flags_benchmark_copies_and_broadcasts(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, bench_text, "en", "s", len(bench_text)),  # benchmark member (id % 50 == 0)
            (1, bench_text, "en", "s", len(bench_text)),  # full copy -> contaminated
            (2, "one two three four five six seven eight", "en", "s", 38),
        ],
        DOC_SCHEMA,
    )
    res = contamination_check(docs, ngram=5, bench_mod=50, threshold=0.5)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark shingles are the broadcast side
    out = {r["doc_id"]: r for r in res.collect()}
    assert 0 not in out  # benchmark members are not scored
    assert out[1]["contaminated"] == 1 and out[1]["contam_ratio"] == 1.0
    assert out[2]["contaminated"] == 0 and out[2]["n_overlap"] == 0


def test_contamination_falls_back_to_shuffle_join_when_bench_large(spark):
    docs = _docs(spark, [(f"w{i} w{i + 1} w{i + 2} w{i + 3} w{i + 4} w{i + 5}", "en", "s") for i in range(8)])
    # guard tripped -> no forced broadcast hint; with auto-broadcast off
    # (as a too-big-to-broadcast side would be at scale) the join must
    # still plan and evaluate as a shuffle join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        res = contamination_check(docs, ngram=5, bench_mod=2, max_broadcast_shingles=1)
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert res.count() == 4  # scored side (odd ids) still fully evaluated
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zz").alias("lang"),
        F.lit("s").alias("source"),
        F.lit("x y z").alias("text"),
        F.lit(5).alias("n_chars"),
    )
    a = stratified_sample(docs).collect()
    b = stratified_sample(docs).collect()
    assert a == b  # no RNG: re-runs emit the identical sample
    by_lang = {"en": 0, "zz": 0}
    for r in a:
        by_lang[r["lang"]] += 1
    # en keeps ~80%, default stratum ~10% of 1000 docs each
    assert 700 < by_lang["en"] < 900 and 50 < by_lang["zz"] < 160


def test_sample_hash_is_pure_int64(spark):
    df = spark.range(5).select(sample_hash(F.col("id")).alias("h"))
    assert [r["h"] for r in df.collect()] == [(i * 2654435761 + 104729) % 1000 for i in range(5)]


def test_pack_sequences_bins_and_fill(spark):
    # 3 docs of ~512 tokens (2047 chars -> 512), 1 doc spilling to bin 1
    txt = "x" * 2047
    docs = _docs(spark, [(txt, "en", "s")] * 5)
    out = pack_sequences(docs, ctx_len=2048).collect()
    bins = {r["bin"]: r for r in out}
    # 512-token docs: 4 fit exactly in [0, 2048), the 5th starts at 2048
    assert bins[0]["n_docs"] == 4 and bins[0]["total_tokens"] == 2048
    assert bins[0]["fill_ratio"] == 1.0
    assert bins[1]["n_docs"] == 1


def test_domain_mix_rebalances_to_uniform(spark):
    docs = _docs(
        spark,
        [("w " * 400, "en", "big")] * 9 + [("w " * 400, "en", "small")],
    )
    out = {r["source"]: r for r in domain_mix(docs).collect()}
    assert out["small"]["sample_prob"] == 1.0  # under-represented: keep all
    assert out["big"]["sample_prob"] < 0.6  # over-represented: downsample
    assert abs(out["big"]["natural_share"] - 0.9) < 0.01


def test_dedup_canonical_keeps_longest_then_min_id(spark):
    docs = spark.createDataFrame(
        [
            (10, "same text", "en", "s", 9),
            (3, "same text", "en", "s", 9),  # tie on digest+len -> min id wins
            (7, "other", "en", "s", 5),
        ],
        DOC_SCHEMA,
    )
    out = dedup_canonical(docs).collect()
    ids = {r["doc_id"]: r["n_copies"] for r in out}
    assert ids == {3: 2, 7: 1}


def test_dedup_clusters_transitive_closure(spark):
    # chain a~b~c (a!~c directly) must still land in one cluster
    docs = _docs(
        spark,
        [
            ("one two three four five six", "en", "s"),  # 0
            ("one two three four five seven", "en", "s"),  # 1: shares 3 of 5 3-grams w/ 0
            ("zzz two three four five seven", "en", "s"),  # 2: near 1, far from 0
            ("totally different words here now", "en", "s"),  # 3: isolated (no pairs)
        ],
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, ngram=3, threshold=0.4).collect()}
    assert out[0] == out[1] == out[2] == 0
    assert 3 not in out  # no edges -> not in the pair graph


def test_vocab_coverage_broadcasts_vocab(spark):
    docs = _docs(spark, [("a a a b c", "en", "s"), ("d e", "en", "s")])
    res = vocab_coverage(docs, top_k=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    out = {r["doc_id"]: r for r in res.collect()}
    # vocab = {a (3), b (1)} with lexicographic tiebreak among count-1 words
    assert out[0]["n_in_vocab"] == 4 and out[0]["vocab_cov"] == 0.8
    assert out[1]["n_in_vocab"] == 0


def test_pii_scrub_patterns_and_order(spark):
    from yamon_spark.operators.curation import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail a.user+tag@sub.example.org end", "en", "s", 1),
            (1, "server at 192.168.1.254 port", "en", "s", 1),
            (2, "card 4111111111111111 and sid 900000001", "en", "s", 1),
            (3, "call +1 (555) 867-5309 now", "en", "s", 1),
            (4, "clean text with no pii at all", "en", "s", 1),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[0]["n_email"] == 1 and "<EMAIL>" in out[0]["text_scrubbed"]
    assert out[1]["n_ip"] == 1 and "<IP>" in out[1]["text_scrubbed"]
    # contiguous digit runs become <ID>, NOT <PHONE> (order contract)
    assert out[2]["n_id"] == 2 and out[2]["n_phone"] == 0
    assert out[3]["n_phone"] == 1 and "<PHONE>" in out[3]["text_scrubbed"]
    assert out[4]["text_scrubbed"] == "clean text with no pii at all"
    assert all(out[4][c] == 0 for c in ("n_email", "n_ip", "n_id", "n_phone"))


def test_curate_corpus_end_to_end(spark):
    from yamon_spark.operators.curation import curate_corpus

    good = "the quick brown fox jumps over a lazy dog and runs far away today"
    bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa of the land"
    docs = spark.createDataFrame(
        [
            (1, good, "en", "s1", len(good)),
            (2, good, "en", "s1", len(good)),  # exact dup of 1 -> dropped
            (3, "tiny", "en", "s1", 4),  # quality-gated
            (50, bench, "en", "s2", len(bench)),  # benchmark member (50 % 50 == 0)
            (51, bench + " x", "en", "s2", len(bench) + 2),  # contaminated copy
            (52, "one two three of the four five six seven eight nine ten", "en", "s2", 55),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    curated, report = curate_corpus(docs, contam_threshold=0.5)
    rep = {r["stage"]: r["rows"] for r in report.collect()}
    assert rep["input"] == 6
    assert rep["quality_gate"] == 5  # doc 3 out
    assert rep["exact_dedup"] == 4  # doc 2 out (doc 1 survives: min id)
    # doc 51 out (full 5-gram overlap) AND doc 50 out (the benchmark
    # member itself — eval data must never reach the training corpus)
    assert rep["decontaminate"] == 2
    out = {r["doc_id"]: r for r in curated.collect()}
    assert 2 not in out and 3 not in out and 50 not in out and 51 not in out
    assert 1 in out and out[1]["n_tokens"] == len(good) // 4 + 1
    assert out[1]["text_scrubbed"] == good  # clean text passes through


def test_docs_to_shards_bounded_and_deterministic(spark, tmp_path):
    from yamon_spark.operators.curation import docs_to_shards

    txt = "x" * 399  # 100 tokens/doc
    docs = spark.createDataFrame(
        [(i, txt, "en" if i % 2 == 0 else "de", "s", len(txt)) for i in range(20)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "shards")
    manifest = docs_to_shards(docs, out, target_tokens=300, stratum="lang").collect()
    # 10 docs x 100 tokens per lang, 300-token shards -> shards of 3 docs
    # (bin of the doc's START offset), last shard holds the remainder
    by = {(r["lang"], r["shard"]): r for r in manifest}
    assert all(r["tokens"] <= 300 for r in manifest)
    assert sum(r["n_docs"] for r in manifest) == 20
    assert by[("en", 0)]["n_docs"] == 3 and by[("en", 3)]["n_docs"] == 1
    # identical re-export (determinism): same manifest
    again = docs_to_shards(docs, out, target_tokens=300, stratum="lang").collect()
    assert manifest == again
    # directory layout is the shard index: reading one shard prunes
    import os

    assert os.path.isdir(os.path.join(out, "lang=en", "shard=0"))


def test_dedup_clusters_long_chain_converges(spark):
    # a 40-doc CHAIN (each doc near-dups only its neighbors): plain
    # min-propagation needs ~40 rounds; pointer jumping must close it
    # within the default cap and label the whole chain with doc 0
    texts = []
    words = [f"w{i}" for i in range(200)]
    for i in range(40):
        # doc i = words[3i : 3i+9]: shares 6 of 9 words with doc i+1
        texts.append(" ".join(words[3 * i : 3 * i + 9]))
    docs = _docs(spark, [(t, "en", "s") for t in texts])
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, ngram=3, threshold=0.15).collect()}
    assert len(out) == 40
    assert set(out.values()) == {0}


def test_bm25_normalizes_terms_and_rejects_empty(spark):
    """Query terms go through the documents' own tokenization: "Spark!"
    must match token "spark" instead of silently scoring tf=0; an
    all-empty term list raises instead of IndexError (ADVICE r4)."""
    from yamon_spark.operators.text import bm25_scores

    docs = _docs(spark, [("spark shuffles data", "en", "s"), ("no match here", "en", "s")])
    plain = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["spark"]).collect()}
    shouty = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["Spark!"]).collect()}
    assert plain and plain == shouty
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25_scores(docs, [])
    with _pytest.raises(ValueError):
        bm25_scores(docs, ["!!!"])


def test_source_divergence_zero_for_identical_distributions(spark):
    from yamon_spark.operators.curation import source_divergence

    rows = [
        (0, "a b c d", "en", "s1", 7),
        (1, "a b c d", "en", "s2", 7),  # identical distribution -> KL 0
        (2, "z z z z", "en", "s3", 7),  # skewed -> KL > 0
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.source: r for r in source_divergence(docs).collect()}
    assert out["s3"].kl_bits > out["s1"].kl_bits >= 0.0
    assert out["s1"].n_tokens == 4
    # s1 and s2 see the same corpus from the same distribution
    assert out["s1"].kl_bits == out["s2"].kl_bits


def test_source_overlap_counts_shared_shingles(spark):
    from yamon_spark.operators.curation import source_overlap

    shared = " ".join(f"w{i}" for i in range(8))  # exactly one 8-gram
    rows = [
        (0, shared + " tail1", "en", "sA", 1),
        (1, shared + " tail2", "en", "sB", 1),
        (2, "totally different words here for this one doc x", "en", "sC", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {(r.src_a, r.src_b): r.n_shared for r in source_overlap(docs, ngram=8).collect()}
    assert out == {("sA", "sB"): 1}  # only the one copied 8-gram window


def test_dedup_budget_impact_policies(spark):
    """Planted duplicate structure: 3 copies of a 4-token doc (ids 0-2)
    + 1 unique 2-token doc (id 3). raw = 4 docs / 14 tokens; hard = 2
    docs / 6 tokens; count_aware upweights the duplicated survivor by
    1+ln(3) -> 4*(1+ln 3) + 2*(1+ln 1) tokens — strictly between hard
    and raw, which is the policy's point."""
    import math

    from yamon_spark.operators.dedup import dedup_budget_impact

    rows = [(i, "a b c d") for i in range(3)] + [(3, "x y")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.policy: r for r in dedup_budget_impact(docs).collect()}
    assert set(out) == {"raw", "hard", "count_aware"}
    assert (out["raw"].eff_docs, out["raw"].eff_tokens) == (4, 14.0)
    assert (out["hard"].eff_docs, out["hard"].eff_tokens) == (2, 6.0)
    assert out["count_aware"].eff_docs == 2
    assert out["count_aware"].eff_tokens == round(4 * (1 + math.log(3)) + 2, 4)
    assert out["hard"].eff_tokens < out["count_aware"].eff_tokens < out["raw"].eff_tokens


def test_corpus_snapshot_diff_statuses_and_plan(spark):
    """The operator diffs two REAL (doc_id, text) snapshots (no baked-in
    fixture): handcrafted ids hit all four statuses with exact counts,
    and the unique-key join must be a shuffle HASH join (no sort on a
    unique key), never sort-merge."""
    from yamon_spark.operators.dedup import corpus_snapshot_diff

    # ids 0..25: 7,17 added (only in new); 3,13,23 removed (only in old);
    # id 0 edited in new -> changed
    rows = [(i, f"w{i} x y z") for i in range(26)]
    old = spark.createDataFrame(
        [r for r in rows if r[0] not in (7, 17)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(i, t + " edited" if i == 0 else t) for i, t in rows if i not in (3, 13, 23)],
        "doc_id long, text string",
    )
    out = {r.status: r for r in corpus_snapshot_diff(old, new).collect()}
    assert out["added"].n_docs == 2  # 7, 17
    assert out["removed"].n_docs == 3  # 3, 13, 23
    assert out["changed"].n_docs == 1  # 0
    assert out["unchanged"].n_docs == 26 - 2 - 3 - out["changed"].n_docs
    # token accounting: every doc is 4 tokens; changed docs carry +1 ('edited')
    assert out["unchanged"].n_tokens == out["unchanged"].n_docs * 4
    assert out["changed"].n_tokens == out["changed"].n_docs * 5
    plan = corpus_snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_logprob_penalizes_word_soup(spark):
    """Two docs over the same vocabulary: one repeats a fixed phrase
    (high-probability bigrams), one is a scrambled soup of the same
    words (bigrams mostly unseen -> unigram backoff only). The phrase
    doc must score strictly higher, and every score is finite/negative."""
    from yamon_spark.operators.curation import bigram_logprob

    phrase = "the quick brown fox jumps " * 8
    soup = "fox the jumps quick brown jumps the fox brown quick " * 4
    docs = spark.createDataFrame(
        [(0, phrase.strip()), (1, soup.strip()), (2, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_logprob(docs, top_k=50, lam=0.8).collect()}
    assert set(out) == {0, 1}  # the 1-word doc has no bigrams
    assert out[0].mean_logprob > out[1].mean_logprob
    for r in out.values():
        assert r.mean_logprob < 0.0 and r.n_bigrams > 0


def test_trigram_logprob_catches_shuffled_pairs(spark):
    """Three docs over the same vocabulary: one repeats a fixed 5-word
    phrase (its trigrams dominate the model), one repeats the same
    BIGRAMS chained in a different order (every adjacent pair is
    common, but the trigram contexts differ from the phrase doc's),
    one is scrambled soup. The phrase doc must outscore the re-chained
    doc — the separation a bigram filter cannot make — and the soup
    doc must score lowest. Docs with <3 words are absent."""
    from yamon_spark.operators.curation import trigram_logprob

    phrase = "the quick brown fox jumps " * 8
    # same bigrams as common English-ish chains, different trigram contexts
    rechain = "quick brown fox jumps the " * 8
    soup = "fox the jumps quick brown jumps the fox brown quick " * 4
    docs = spark.createDataFrame(
        [(0, phrase.strip()), (1, rechain.strip()), (2, soup.strip()), (3, "two words")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in trigram_logprob(docs, top_k=50).collect()}
    assert set(out) == {0, 1, 2}  # the 2-word doc has no trigrams
    assert out[0].mean_logprob > out[2].mean_logprob
    assert out[1].mean_logprob > out[2].mean_logprob
    for r in out.values():
        assert r.mean_logprob < 0.0 and r.n_trigrams > 0


def test_sample_eval_slice_exact_size_and_content_keyed(spark):
    """Exactly per_group docs per (lang, source); the slice is keyed on
    CONTENT, so re-assigning doc_ids (a re-crawl) keeps the same texts
    in the slice."""
    from yamon_spark.operators.curation import sample_eval_slice

    rows = [(i, f"text number {i} with words", "en" if i % 2 else "de", f"s{i % 3}")
            for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = sample_eval_slice(docs, per_group=5).collect()
    sizes = {}
    for r in out:
        sizes[(r.lang, r.source)] = sizes.get((r.lang, r.source), 0) + 1
        assert 1 <= r.rk <= 5
    assert set(sizes.values()) == {5} and len(sizes) == 6

    # re-crawl: same texts, doc_ids shifted by 1000 -> same slice contents
    id_to_text = {i: t for i, t, _, _ in rows}
    shuffled = spark.createDataFrame(
        [(i + 1000, t, lang, s) for i, t, lang, s in rows],
        "doc_id long, text string, lang string, source string",
    )
    texts_a = sorted(id_to_text[r.doc_id] for r in out)
    texts_b = sorted(id_to_text[r.doc_id - 1000] for r in sample_eval_slice(shuffled, per_group=5).collect())
    assert texts_a == texts_b


def test_quality_score_psi_detects_planted_drift(spark):
    """Identical slices score psi ~0; a new slice whose docs shift the
    head's score distribution (short/word-soup docs the rule gate
    rejects) raises psi well past the 0.25 retrain alarm."""
    from yamon_spark.operators.curation import quality_head_fit, quality_score_psi

    rows = []
    for i in range(60):
        # varied GOOD docs (pass the rule gate) + a rejected minority so
        # the head learns real feature weights, not just an intercept
        rows.append(
            (i, "the quick brown fox jumps over a lazy dog in the field " * (2 + i % 4))
        )
    for i in range(20):
        rows.append((100 + i, "zzz xq qqq"))  # short, no stopwords -> reject
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = quality_head_fit(docs, iters=12, lr=4.0)

    same = quality_score_psi(docs, docs, model).first()
    assert same.n_ref == same.n_new == 80
    assert abs(same.psi) < 1e-9  # identical distributions

    drifted = spark.createDataFrame(
        [(1000 + i, "zzz xq qqq") for i in range(80)], "doc_id long, text string"
    )
    moved = quality_score_psi(docs, drifted, model).first()
    assert moved.psi > 0.25  # all mass moved to the reject band: retrain alarm


def test_pack_boundary_report_counts_straddlers_exactly(spark):
    """Handcrafted stream: ctx 10, doc tokens 4/4/4 -> doc 2 straddles
    (starts at 8, ends at 11); total 12 -> 2 bins, efficiency 0.6."""
    from yamon_spark.operators.curation import pack_boundary_report

    # est_tokens = n_chars//4 + 1 -> 12 chars = 4 tokens
    docs = spark.createDataFrame(
        [(i, "x" * 12, "en", "s", 12) for i in range(3)], DOC_SCHEMA
    )
    r = pack_boundary_report(docs, ctx_len=10).first()
    assert r.n_docs == 3 and r.n_split_docs == 1
    assert r.split_ratio == round(1 / 3, 4)
    assert r.n_bins == 2 and r.efficiency == 0.6


def test_dedup_threshold_sweep_monotone_and_exact(spark):
    """Handcrafted three-vector cell: identical pair (cos 1.0) plus a
    near pair (~0.9962): thresholds at/below 0.9 catch both, 1.0 catches
    only the exact pair; counts are monotone non-increasing in t and
    n_removed counts DISTINCT higher ids."""
    from yamon_spark.operators.dedup import dedup_threshold_sweep

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0, 0.0], 0),  # exact dup of 0
        (2, [1.0, 0.1, 0.0, 0.0], 0),  # near dup of both
        (3, [0.0, 1.0, 0.0, 0.0], 1),  # other cell: no pairs
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r.threshold: r for r in dedup_threshold_sweep(emb, thresholds=[0.9, 1.0]).collect()}
    assert out[0.9].n_pairs == 3  # (0,1), (0,2), (1,2)
    assert out[0.9].n_removed == 2  # distinct higher ids: 1, 2
    assert out[0.9].removed_frac == 0.5
    assert out[1.0].n_pairs == 1 and out[1.0].n_removed == 1
    ts = sorted(out)
    assert all(out[a].n_pairs >= out[b].n_pairs for a, b in zip(ts, ts[1:]))


def test_dedup_threshold_sweep_lsh_auto_blocking(spark):
    """target_block switches the sweep onto the corpus-size-scaled LSH
    blocking (bounded blocks at any scale); on a small frame where all
    near-identical vectors share an LSH bucket, the sweep still finds
    the planted dups."""
    from yamon_spark.operators.dedup import dedup_threshold_sweep

    rows = [(i, [1.0, 0.001 * (i % 2), 0.0, 0.0] + [0.0] * 60, 0) for i in range(6)]
    rows += [(10 + i, [-1.0, 0.0, 0.5, 0.0] + [0.0] * 60, 1) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r.threshold: r for r in
           dedup_threshold_sweep(emb, thresholds=[0.9], target_block=512).collect()}
    # cluster A: 6 near-identical -> 5 removed; cluster B: 3 identical
    # in the complementary bucket -> 2 removed; both buckets swept
    assert out[0.9].n_removed == 7
    assert out[0.9].n_pairs == 15 + 3
    assert out[0.9].removed_frac == round(7 / 9, 4)
