"""Unit tests for the r10 corpus-health operators — crafted inputs that
hit each rule/tier, beyond the fixture-level oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_gopher_rules_each_rule_fires_on_its_crafted_doc(spark):
    from yamon_spark.operators.curation import GOPHER_RULES, quality_gopher_rules

    good = "the quick brown fox jumps over a lazy dog of night and day in town " * 2
    docs = _docs(
        spark,
        [
            good,
            "short of the and in a",  # word count < 10 (6 words)
            "the of a in and " + " ".join(["transcendentally"] * 20),  # awl > 12? awl ok; long_word fires
            "zz xx yy qq ww ee rr tt uu ii oo pp",  # no stopwords
            good + " 1234 5678 9012 !!!! ####  " + "9" * 400,  # digits/symbols -> alpha ratio low
        ],
    )
    rows = {r.rule: r for r in quality_gopher_rules(docs).collect()}
    assert set(rows) == set(GOPHER_RULES)
    assert rows["word_count_out_of_range"].n_fail == 1
    assert rows["stopword_hits_low"].n_fail == 1
    assert rows["long_word_present"].n_fail == 2  # the 16-char word + the 400-char digit run
    assert rows["alpha_ratio_low"].n_fail == 1
    # fail_frac is n_fail / n_docs
    assert rows["stopword_hits_low"].fail_frac == round(1 / 5, 4)


def test_doc_length_survival_accounts_every_token(spark):
    from yamon_spark.operators.text import doc_length_survival

    # 3 docs of 10, 100, 300 words against cuts 64 and 256
    docs = _docs(spark, [" ".join(["w"] * n) for n in (10, 100, 300)])
    rows = {r.cut: r for r in doc_length_survival(docs, cuts=(64, 256)).collect()}
    assert rows[64].n_docs_truncated == 2
    assert rows[64].tokens_lost == (100 - 64) + (300 - 64)
    assert rows[64].frac_tokens_lost == round(272 / 410, 4)
    assert rows[256].n_docs_truncated == 1
    assert rows[256].tokens_lost == 44
    assert rows[256].frac_docs_truncated == round(1 / 3, 4)


def test_intrinsic_dim_isotropic_vs_collapsed(spark):
    from yamon_spark.operators.similarity import embedding_intrinsic_dim

    # isotropic: 4 dims each alternating 0/1 -> equal variance -> PR = 4
    iso = spark.range(16).select(
        F.array(*[((F.col("id") / (2**i)).cast("long") % 2).cast("float") for i in range(4)]).alias(
            "embedding"
        )
    )
    r = embedding_intrinsic_dim(iso).first()
    assert r.n_dims == 4 and r.participation_ratio == 4.0
    # collapsed: all variance in dim 0 -> PR = 1, top share = 1
    col = spark.range(16).select(
        F.array((F.col("id") % 2).cast("float"), F.lit(0.5).cast("float")).alias("embedding")
    )
    r2 = embedding_intrinsic_dim(col).first()
    assert r2.n_dims == 2 and r2.participation_ratio == 1.0 and r2.top_dim_share == 1.0


def test_cluster_sizes_tiers(spark):
    from yamon_spark.operators.dedup import dedup_cluster_sizes

    docs = _docs(spark, ["a a", "b b", "b b", "c c", "c c", "c c"])
    rows = {r.cluster_size: r for r in dedup_cluster_sizes(docs).collect()}
    assert rows[1].n_clusters == 1 and rows[1].n_docs == 1
    assert rows[2].n_clusters == 1 and rows[2].n_docs == 2
    assert rows[3].n_clusters == 1 and rows[3].n_docs == 3


def test_centroid_margin_separable_labels_have_zero_misassignment(spark):
    from yamon_spark.operators.similarity import centroid_margin_report

    # two tight, well-separated clusters -> nearest centroid is own label
    rows = []
    for i in range(8):
        rows.append((i, 0, [float(i % 2) * 0.01, 0.0]))
        rows.append((100 + i, 1, [10.0 + float(i % 2) * 0.01, 0.0]))
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = {r.label: r for r in centroid_margin_report(emb).collect()}
    assert out[0].n_misassigned == 0 and out[1].n_misassigned == 0
    assert out[0].n_vecs == 8 and out[1].n_vecs == 8
    assert out[0].avg_margin > 5.0  # inter-centroid distance ~10


def test_band_tuning_monotone_in_band_size(spark):
    from yamon_spark.operators.dedup import lsh_band_tuning

    # near-dup pairs: doc 2i and 2i+1 share most words
    texts = []
    for i in range(20):
        base = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i} theta{i}"
        texts.append(base)
        texts.append(base + " extra")
    out = lsh_band_tuning(_docs(spark, texts), num_hashes=12).collect()
    assert [r.band_size for r in out] == [2, 3, 4, 6]
    assert [r.n_bands for r in out] == [6, 4, 3, 2]
    # fewer rows per band = more collisions: candidate checks decrease
    # (weakly) as band_size grows; analytic threshold increases strictly
    checks = [r.candidate_checks for r in out]
    assert all(a >= b for a, b in zip(checks, checks[1:]))
    thr = [r.est_threshold for r in out]
    assert all(a < b for a, b in zip(thr, thr[1:]))


def test_blas_kernels_zero_vector_scores_zero_not_nan(spark):
    """Zero embeddings score cosine 0.0 against everything (the
    _safe_norms convention) — previously NaN sims cast to garbage int64
    composite keys. Covers the batched top-k (query AND candidate side)
    and the nearest-bench projection."""
    from pyspark.sql import functions as F

    from yamon_spark.operators.similarity import contamination_semantic, knn_join

    rows = [(0, 0, [0.0, 0.0]), (1, 0, [1.0, 0.0]), (2, 0, [0.0, 1.0]), (3, 0, [1.0, 1.0])]
    emb = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    # vec 0 is both the (zero) query and absent from candidates
    out = {(r.q_id, r.vec_id): r.cos_sim for r in knn_join(emb, query_mod=97, k=3).collect()}
    assert out == {(0, 1): 0.0, (0, 2): 0.0, (0, 3): 0.0}

    # zero CANDIDATE: query 0 = [1,0]; candidate 50 is the zero vector
    rows2 = [(0, 0, [1.0, 0.0]), (50, 0, [0.0, 0.0]), (3, 0, [0.0, 1.0])]
    emb2 = spark.createDataFrame(rows2, "vec_id long, label int, embedding array<float>")
    got = {r.vec_id: r.cos_sim for r in knn_join(emb2, query_mod=97, k=3).collect()}
    assert got == {50: 0.0, 3: 0.0}

    cont = {r.vec_id: r for r in contamination_semantic(emb2, bench_mod=2, threshold=0.5).collect()}
    # bench = {0, 50} (even ids); corpus = {3}: zero-bench scores 0, real
    # bench also 0 (orthogonal) -> tie to lowest b_id, below threshold
    assert cont[3].cos_sim == 0.0 and cont[3].nearest_bench == 0 and cont[3].contaminated == 0
