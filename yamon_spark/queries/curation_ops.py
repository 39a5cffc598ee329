"""Declared queries for the corpus-curation operators (quality gating,
repetition, contamination, sampling, packing, mixing, canonical dedup,
duplicate clustering, vocabulary coverage, embedding stats/range search)
— the training-data-pipeline inventory beyond the reference's own surface
(SURVEY §2 'beyond the reference').

Determinism contract: ratios that are one int/int IEEE division are
UNROUNDED (bit-identical across engines — no round-tie exposure);
averages over cross-partition float sums round to 4; flags are ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from yamon_spark.queries import register, table
from yamon_spark.queries.pipeline_ops import _COS_EXPRS, _STOP_SQL, _WORDS


@register(
    "text_quality_filter",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    f AS (
      SELECT doc_id,
        CAST(len(w) AS BIGINT) AS n_words,
        list_reduce(list_transform(w, x -> CAST(length(x) AS DOUBLE)), (a, b) -> a + b)
          / len(w) AS avg_word_len,
        CAST(len(list_filter(w, x -> {_STOP_SQL})) AS DOUBLE) / len(w) AS stop_ratio
      FROM t
    ),
    r AS (
      SELECT *, CASE WHEN n_words < 10 THEN 'too_short'
                     WHEN n_words > 1000 THEN 'too_long'
                     WHEN avg_word_len < 2.0 OR avg_word_len > 12.0 THEN 'word_len'
                     WHEN stop_ratio < 0.01 THEN 'no_stopwords'
                     ELSE 'ok' END AS reason
      FROM f
    )
    SELECT doc_id, n_words, avg_word_len, stop_ratio, reason,
           CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS INT) AS keep
    FROM r ORDER BY doc_id
    """,
    doc="Gopher/C4-style quality gate with first-failing-rule reason.",
)
def quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import quality_filter

    return quality_filter(table(spark, sf_dir, "documents"))


@register(
    "text_repetition",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    s AS (
      SELECT doc_id, list_transform(range(1, greatest(len(w) - 2, 1) + 1),
               i -> array_to_string(w[i:i+2], ' ')) AS sh
      FROM t
    )
    SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct,
           1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) AS rep_ratio,
           CAST(CASE WHEN 1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) > 0.1
                THEN 1 ELSE 0 END AS INT) AS repetitive
    FROM s ORDER BY doc_id
    """,
    doc="Intra-doc repeated word-3-gram ratio (boilerplate/spam signal).",
)
def repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import repetition_stats

    return repetition_stats(table(spark, sf_dir, "documents"), ngram=3, max_rep=0.1)


# module constant so contamination_report can nest the same SQL verbatim
_CONTAM_NGRAM_SQL = f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(w) - 4, 1) + 1),
        i -> array_to_string(w[i:i+4], ' ')))) AS shingle
      FROM t
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    scored AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
    j AS (
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(count(b.shingle) AS BIGINT) AS n_overlap
      FROM scored s LEFT JOIN bench b ON s.shingle = b.shingle
      GROUP BY s.doc_id
    )
    SELECT doc_id, n_shingles, n_overlap,
           CAST(n_overlap AS DOUBLE) / n_shingles AS contam_ratio,
           CAST(CASE WHEN CAST(n_overlap AS DOUBLE) / n_shingles >= 0.5
                THEN 1 ELSE 0 END AS INT) AS contaminated
    FROM j ORDER BY doc_id
    """


@register(
    "contamination_ngram",
    _CONTAM_NGRAM_SQL,
    doc="Benchmark contamination: distinct 5-gram overlap vs the eval set.",
)
def contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import contamination_check

    return contamination_check(table(spark, sf_dir, "documents"), ngram=5, bench_mod=50, threshold=0.5)


@register(
    "text_mattr",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents)
    SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
           CASE WHEN len(w) >= 25 THEN
             CAST((2 * list_reduce(list_transform(range(1, len(w) - 25 + 2),
                    i -> CAST(len(list_distinct(w[i:i+24])) AS BIGINT)),
                    (a, b) -> a + b) * 10000
                   + 25 * CAST(len(w) - 25 + 1 AS BIGINT))
                  // (2 * 25 * CAST(len(w) - 25 + 1 AS BIGINT)) AS DOUBLE) / 10000.0
           ELSE
             CAST((2 * CAST(len(list_distinct(w)) AS BIGINT) * 10000
                   + CAST(len(w) AS BIGINT))
                  // (2 * CAST(len(w) AS BIGINT)) AS DOUBLE) / 10000.0
           END AS mattr,
           CAST(len(w) >= 25 AS INT) AS windowed
    FROM t ORDER BY doc_id
    """,
    doc=(
        "Moving-average type-token ratio (MATTR, window 25) — the "
        "length-robust lexical-diversity gate plain TTR cannot be "
        "(TTR is confounded by doc length): mean distinct-ratio over "
        "all 25-word sliding windows; templated/looping text scores "
        "low at any length. Short docs fall back to plain TTR with "
        "windowed=0. The mean is computed in exact INTEGER arithmetic "
        "(Σ window-distinct counts, one half-up division at 4dp): the "
        "earlier double fold hit an exact .xxxx5 half-tie at sf0.1 "
        "where engine round() directions diverge. Per-doc array math, "
        "shuffle-free."
    ),
)
def text_mattr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import mattr

    return mattr(table(spark, sf_dir, "documents"), window=25)


@register(
    "sample_eval_slice",
    """
    WITH r AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY CAST('0x' || substr(md5(lower(text) || ':eval'), 1, 8) AS BIGINT),
                        doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, lang, source, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 20 ORDER BY lang, source, rk
    """,
    doc=(
        "Fixed-size per-domain eval slice: exactly N docs per (lang, "
        "source), ranked by the salted CONTENT hash (re-crawls with "
        "shuffled doc_ids keep the same slice for unchanged docs; ties "
        "on doc_id). Rate-based sampling cannot promise exact slice "
        "sizes; eval sets need exactly N. One window rank per group — "
        "a single group-key shuffle."
    ),
)
def sample_eval_slice_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import sample_eval_slice

    return sample_eval_slice(table(spark, sf_dir, "documents"), per_group=20, salt="eval")


@register(
    "text_bigram_logprob",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    flat AS (
      SELECT doc_id, s.prev AS prev, s.wrd AS wrd FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w)),
          i -> struct_pack(prev := w[i], wrd := w[i + 1]))) AS s
        FROM t WHERE len(w) >= 2
      )
    ),
    uni AS (
      SELECT word, count(*) AS cnt FROM (
        SELECT unnest({_WORDS}) AS word FROM documents
      ) GROUP BY word
    ),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM uni),
    univ AS (SELECT word, cnt FROM uni ORDER BY cnt DESC, word LIMIT 2000),
    biv AS (
      SELECT prev, wrd, count(*) AS bcnt FROM flat GROUP BY prev, wrd
      ORDER BY bcnt DESC, prev, wrd LIMIT 2000
    ),
    scored AS (
      SELECT f.doc_id,
             ln(0.8 * (CASE WHEN b.bcnt IS NOT NULL AND up.cnt IS NOT NULL
                            THEN CAST(b.bcnt AS DOUBLE) / up.cnt ELSE 0.0 END)
                + {1.0 - 0.8} * (coalesce(CAST(uw.cnt AS DOUBLE), 0.5) / tot.total)) AS logp
      FROM flat f
      LEFT JOIN biv b ON f.prev = b.prev AND f.wrd = b.wrd
      LEFT JOIN univ up ON f.prev = up.word
      LEFT JOIN univ uw ON f.wrd = uw.word
      CROSS JOIN tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(logp), 4) AS mean_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    doc=(
        "Interpolated bigram-LM quality score — the conditional-"
        "probability step between the unigram perplexity input and "
        "CCNet's 5-gram LM: mean log of lam*c(prev,w)/c(prev) + "
        "(1-lam)*P_uni(w) per doc, bigram term only when both the "
        "bigram and prev are inside the top-2000 models, unigram OOV "
        "half-count floor keeping every probability positive. Word "
        "soup of individually-common words scores low — the failure "
        "mode a unigram filter cannot see. Three bounded broadcasts "
        "against one bigram-exploded scan."
    ),
)
def text_bigram_logprob_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import bigram_logprob

    return bigram_logprob(table(spark, sf_dir, "documents"), top_k=2000, lam=0.8)


@register(
    "text_trigram_logprob",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    flat AS (
      SELECT doc_id, s.u AS u, s.v AS v, s.wrd AS wrd FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
          i -> struct_pack(u := w[i], v := w[i + 1], wrd := w[i + 2]))) AS s
        FROM t WHERE len(w) >= 3
      )
    ),
    flat2 AS (
      SELECT s.p AS p, s.q AS q FROM (
        SELECT unnest(list_transform(range(1, len(w)),
          i -> struct_pack(p := w[i], q := w[i + 1]))) AS s
        FROM t WHERE len(w) >= 2
      )
    ),
    uni AS (
      SELECT word, count(*) AS cnt FROM (
        SELECT unnest({_WORDS}) AS word FROM documents
      ) GROUP BY word
    ),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM uni),
    univ AS (SELECT word, cnt FROM uni ORDER BY cnt DESC, word LIMIT 3000),
    biv AS (
      SELECT p, q, count(*) AS bcnt FROM flat2 GROUP BY p, q
      ORDER BY bcnt DESC, p, q LIMIT 3000
    ),
    triv AS (
      SELECT u, v, wrd, count(*) AS tcnt FROM flat GROUP BY u, v, wrd
      ORDER BY tcnt DESC, u, v, wrd LIMIT 3000
    ),
    scored AS (
      SELECT f.doc_id,
             ln(0.6 * (CASE WHEN tr.tcnt IS NOT NULL AND bc.bcnt IS NOT NULL
                            THEN CAST(tr.tcnt AS DOUBLE) / bc.bcnt ELSE 0.0 END)
                + 0.3 * (CASE WHEN bn.bcnt IS NOT NULL AND uv.cnt IS NOT NULL
                              THEN CAST(bn.bcnt AS DOUBLE) / uv.cnt ELSE 0.0 END)
                + {1.0 - 0.6 - 0.3!r} * (coalesce(CAST(uw.cnt AS DOUBLE), 0.5) / tot.total))
               AS logp
      FROM flat f
      LEFT JOIN triv tr ON f.u = tr.u AND f.v = tr.v AND f.wrd = tr.wrd
      LEFT JOIN biv bc ON f.u = bc.p AND f.v = bc.q
      LEFT JOIN biv bn ON f.v = bn.p AND f.wrd = bn.q
      LEFT JOIN univ uv ON f.v = uv.word
      LEFT JOIN univ uw ON f.wrd = uw.word
      CROSS JOIN tot
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
           round(avg(logp), 4) AS mean_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    doc=(
        "Interpolated trigram-LM quality score — the next rung of the "
        "unigram → bigram ladder toward CCNet's 5-gram LM: mean log of "
        "lam3·c(u,v,w)/c(u,v) + lam2·c(v,w)/c(v) + residual·P_uni(w) "
        "(Jelinek–Mercer), each backoff level gated on BOTH its count "
        "and its denominator being inside the top-3000 models, unigram "
        "OOV half-count floor keeping every probability positive. "
        "Catches shuffled/templated text whose word PAIRS are common — "
        "what a bigram filter cannot see. Five bounded model "
        "broadcasts (the bigram model joined twice: trigram "
        "denominator and bigram numerator) against one trigram-"
        "exploded scan; the IEEE residual weight 1.0-0.6-0.3 is "
        "spelled identically on both sides."
    ),
)
def text_trigram_logprob_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import trigram_logprob

    return trigram_logprob(table(spark, sf_dir, "documents"), top_k=3000, lam3=0.6, lam2=0.3)


# module constant so contamination_report can nest the same SQL verbatim
_CONTAM_SEM_SQL = f"""
    WITH q AS (
      SELECT vec_id AS b_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 256
    ), s AS (
      SELECT e.vec_id, q.b_id, {_COS_EXPRS}
      FROM embeddings e CROSS JOIN q WHERE e.vec_id % 50 <> 0
    ), r AS (
      SELECT vec_id, b_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM s
    ), best AS (
      SELECT vec_id, b_id, cos_sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, b_id) AS rn
      FROM r
    )
    SELECT vec_id, b_id AS nearest_bench, cos_sim,
           CAST(cos_sim >= 0.3 AS INT) AS contaminated
    FROM best WHERE rn = 1 ORDER BY vec_id
    """


@register(
    "contamination_semantic",
    _CONTAM_SEM_SQL,
    doc=(
        "Embedding-space benchmark decontamination (semantic twin of "
        "contamination_ngram — n-gram overlap misses paraphrased eval "
        "leakage): every corpus vector scores its nearest benchmark "
        "embedding (vec_id % 50 = 0 stands in for the eval suite; "
        "4dp-rounded cosine, ties to lowest bench id) and flags "
        "contaminated above the threshold. Benchmark side is HARD-CAPPED "
        "at 256 (the knn_join lesson: a modulo sample alone scales with "
        "the corpus and goes quadratic), so the broadcast is O(1) in "
        "corpus size and scoring is one map-side pass."
    ),
)
def contamination_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import contamination_semantic

    return contamination_semantic(
        table(spark, sf_dir, "embeddings"), bench_mod=50, threshold=0.3, max_bench=256
    )


@register(
    "contamination_report",
    f"""
    WITH cn AS ({_CONTAM_NGRAM_SQL}),
    cs AS ({_CONTAM_SEM_SQL}),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(coalesce(sum(contaminated), 0) AS BIGINT)
                   AS ngram_flagged
          FROM cn),
    b AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs,
                 CAST(coalesce(sum(contaminated), 0) AS BIGINT)
                   AS semantic_flagged
          FROM cs)
    SELECT n_docs, ngram_flagged,
           round(CAST(ngram_flagged AS DOUBLE) / n_docs, 4) AS ngram_rate,
           n_vecs, semantic_flagged,
           round(CAST(semantic_flagged AS DOUBLE) / n_vecs, 4)
             AS semantic_rate,
           CAST(CASE WHEN CAST(ngram_flagged AS DOUBLE) / n_docs > 0.05
                      OR CAST(semantic_flagged AS DOUBLE) / n_vecs > 0.05
                THEN 1 ELSE 0 END AS INT) AS page
    FROM a, b
    """,
    doc=(
        "The decontamination page row: ONE row composing the two "
        "contamination monitors — n-gram eval-set overlap (verbatim "
        "leakage) and embedding nearest-benchmark cosine (paraphrased "
        "leakage the n-gram side structurally misses) — as corpus-level "
        "flag rates with a page bit when either exceeds 5%. The "
        "release-gate number a training-data pipeline alarms on before "
        "shipping a corpus snapshot; both sides reduce existing plans "
        "to 1-row aggregates, so the composition adds a single tiny "
        "cross join."
    ),
)
def contamination_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    cn = contamination_q(spark, sf_dir)
    cs = contamination_semantic_q(spark, sf_dir)
    a = cn.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("contaminated"), F.lit(0)).cast("bigint").alias("ngram_flagged"),
    )
    b = cs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.coalesce(F.sum("contaminated"), F.lit(0)).cast("bigint").alias("semantic_flagged"),
    )
    ngram_rate = F.round(F.col("ngram_flagged").cast("double") / F.col("n_docs"), 4)
    sem_rate = F.round(F.col("semantic_flagged").cast("double") / F.col("n_vecs"), 4)
    page = (
        (F.col("ngram_flagged").cast("double") / F.col("n_docs") > 0.05)
        | (F.col("semantic_flagged").cast("double") / F.col("n_vecs") > 0.05)
    ).cast("int")
    return a.crossJoin(b).select(
        "n_docs",
        "ngram_flagged",
        ngram_rate.alias("ngram_rate"),
        "n_vecs",
        "semantic_flagged",
        sem_rate.alias("semantic_rate"),
        page.alias("page"),
    )


@register(
    "sample_stratified",
    """
    WITH r AS (
      SELECT doc_id, lang, source,
        ((doc_id % 2147483647) * 2654435761 + 104729) % 1000 AS h,
        CASE WHEN lang = 'en' THEN 800 WHEN lang = 'es' THEN 500
             WHEN lang = 'de' THEN 250 WHEN lang = 'fr' THEN 125
             ELSE 100 END AS rate_permille
      FROM documents
    )
    SELECT doc_id, lang, source, h, rate_permille
    FROM r WHERE h < rate_permille ORDER BY doc_id
    """,
    doc="Deterministic hash-based stratified sampling (permille per lang).",
)
def stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import stratified_sample

    return stratified_sample(table(spark, sf_dir, "documents"))


@register(
    "pack_sequences",
    """
    WITH t AS (SELECT doc_id, lang, n_chars // 4 + 1 AS tokens FROM documents),
    b AS (
      SELECT doc_id, lang, tokens,
        CAST(coalesce(sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS bin
      FROM t
    )
    SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS total_tokens,
           CAST(CAST(sum(tokens) AS BIGINT) AS DOUBLE) / 2048 AS fill_ratio
    FROM b GROUP BY lang, bin ORDER BY lang, bin
    """,
    doc="Sequence packing: concat per-lang stream, chunk at 2048-token bins.",
)
def pack_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import pack_sequences

    return pack_sequences(table(spark, sf_dir, "documents"), ctx_len=2048)


@register(
    "pack_boundary_report",
    """
    WITH t AS (SELECT doc_id, lang, n_chars // 4 + 1 AS tokens FROM documents),
    b AS (
      SELECT doc_id, lang, tokens,
        coalesce(sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM t
    ),
    g AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN start_tok // 2048 <> (start_tok + tokens - 1) // 2048
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
             CAST(sum(tokens) AS BIGINT) AS total_tokens
      FROM b GROUP BY lang
    )
    SELECT lang, n_docs, n_split_docs,
           round(CAST(n_split_docs AS DOUBLE) / n_docs, 4) AS split_ratio,
           CAST(ceil(CAST(total_tokens AS DOUBLE) / 2048) AS BIGINT) AS n_bins,
           round(CAST(total_tokens AS DOUBLE)
                 / (CAST(ceil(CAST(total_tokens AS DOUBLE) / 2048) AS BIGINT) * 2048), 4)
             AS efficiency
    FROM g ORDER BY lang
    """,
    doc=(
        "Packing QA for pack_sequences: per language stream, the docs "
        "that STRADDLE a 2048-token window boundary (their attention "
        "span gets cut — split_ratio is a ctx-length design input) and "
        "the end-of-stream padding efficiency (concat packing wastes "
        "tokens only in the final partial window). Same one-window-"
        "shuffle plan as the packer, reduced to |langs| rows."
    ),
)
def pack_boundary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import pack_boundary_report

    return pack_boundary_report(table(spark, sf_dir, "documents"), ctx_len=2048)


@register(
    "domain_mix",
    """
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars // 4 + 1) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    sh AS (
      SELECT source, n_docs, tokens,
        CAST(tokens AS DOUBLE) / CAST(sum(tokens) OVER () AS DOUBLE) AS natural_share,
        CAST(1.0 AS DOUBLE) / count(*) OVER () AS target_share
      FROM s
    )
    SELECT source, n_docs, tokens, natural_share, target_share,
           round(least(CAST(1.0 AS DOUBLE), target_share / natural_share), 4) AS sample_prob
    FROM sh ORDER BY source
    """,
    doc="Domain-mix rebalancing: shares + per-source sampling probability.",
)
def domain_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import domain_mix

    return domain_mix(table(spark, sf_dir, "documents"))


@register(
    "dedup_canonical",
    """
    WITH d AS (SELECT doc_id, lang, source, n_chars, sha256(text) AS digest FROM documents),
    w AS (
      SELECT *, row_number() OVER (PARTITION BY digest ORDER BY n_chars DESC, doc_id) AS rn,
             CAST(count(*) OVER (PARTITION BY digest) AS BIGINT) AS n_copies
      FROM d
    )
    SELECT doc_id, lang, source, n_chars, n_copies FROM w WHERE rn = 1 ORDER BY doc_id
    """,
    doc="Exact-dup clusters with canonical survivor (longest, then min id).",
)
def canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import dedup_canonical

    return dedup_canonical(table(spark, sf_dir, "documents"))


_CLUSTER_ORACLE = f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len({_WORDS}) - 2, 1) + 1),
        i -> array_to_string(({_WORDS})[i:i+2], ' ')))) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b) t
      WHERE jaccard >= 0.5
    ),
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )
    SELECT s AS doc_id, CAST(least(s, min(d)) AS BIGINT) AS cluster_id
    FROM reach GROUP BY s ORDER BY doc_id
"""


@register(
    "dedup_clusters",
    _CLUSTER_ORACLE,
    doc=(
        "Connected components over near-dup Jaccard edges via iterative "
        "min-label propagation; oracle = recursive transitive closure."
    ),
)
def clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import dedup_clusters

    return dedup_clusters(table(spark, sf_dir, "documents"), ngram=3, threshold=0.5)


@register(
    "vocab_coverage",
    f"""
    WITH w AS (SELECT doc_id, unnest({_WORDS}) AS word FROM documents),
    v AS (SELECT word FROM (
      SELECT word, count(*) AS cnt FROM w GROUP BY word ORDER BY cnt DESC, word LIMIT 100)),
    j AS (
      SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(count(v.word) AS BIGINT) AS n_in_vocab
      FROM w LEFT JOIN v ON w.word = v.word GROUP BY w.doc_id
    )
    SELECT doc_id, n_words, n_in_vocab,
           CAST(n_in_vocab AS DOUBLE) / n_words AS vocab_cov
    FROM j ORDER BY doc_id
    """,
    doc="Per-doc coverage of the corpus top-100 vocabulary (broadcast).",
)
def vocab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import vocab_coverage

    return vocab_coverage(table(spark, sf_dir, "documents"), top_k=100)


@register(
    "embed_centroids",
    """
    WITH e AS (
      SELECT label, CAST(d - 1 AS INT) AS dim, CAST(embedding[d] AS DOUBLE) AS v
      FROM embeddings, range(1, 65) t(d)
    )
    SELECT label, dim, round(avg(v), 4) AS centroid
    FROM e GROUP BY label, dim ORDER BY label, dim
    """,
    doc="Per-label mean embedding (class prototype / IVF training signal).",
)
def centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import embedding_centroids

    return embedding_centroids(table(spark, sf_dir, "embeddings"))


@register(
    "embed_norm_stats",
    """
    WITH n AS (
      SELECT label, sqrt(list_reduce(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
      FROM embeddings
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs, round(avg(nrm), 4) AS avg_norm,
           round(min(nrm), 4) AS min_norm, round(max(nrm), 4) AS max_norm
    FROM n GROUP BY label ORDER BY label
    """,
    doc="Per-label L2-norm distribution (embedding-health check).",
)
def norm_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import embedding_norm_stats

    return embedding_norm_stats(table(spark, sf_dir, "embeddings"))


@register(
    "ann_range_search",
    f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT e.vec_id, {_COS_EXPRS}
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
    )
    SELECT vec_id, cos_sim FROM (
      SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM s) t
    WHERE cos_sim >= 0.3 ORDER BY cos_sim DESC, vec_id
    """,
    doc="Cosine range search: every neighbor above a similarity floor.",
)
def range_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import cosine_range

    return cosine_range(table(spark, sf_dir, "embeddings"), query_vec_id=0, threshold=0.3)


@register(
    "corpus_shuffle",
    """
    WITH k AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS key
      FROM documents
    ), s AS (
      SELECT doc_id, key,
             ('0x' || substr(key, 1, 8))::BIGINT % 8 AS shard
      FROM k
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS BIGINT) AS pos
    FROM s ORDER BY shard, pos
    """,
    doc=(
        "Deterministic global shuffle for training export: md5-salted "
        "key -> hash-uniform shard + in-shard position; reproducible "
        "across engines/retries, one window shuffle, no global sort."
    ),
)
def corpus_shuffle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import corpus_shuffle

    return corpus_shuffle(table(spark, sf_dir, "documents"), n_shards=8, salt="42")


@register(
    "dedup_substring",
    """
    WITH pos AS (
      SELECT doc_id, text,
             unnest(range(1, greatest(length(text) - 63, 1) + 1, 16)) AS i
      FROM documents
    ), w AS (
      SELECT doc_id, md5(substr(text, CAST(i AS INT), 64)) AS h FROM pos
    ), rep AS (
      SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) > 1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN h IN (SELECT h FROM rep) THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
           ROUND(sum(CASE WHEN h IN (SELECT h FROM rep) THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS rep_frac
    FROM w GROUP BY doc_id ORDER BY doc_id
    """,
    doc=(
        "Cross-doc repeated-substring coverage (exact-substring dedup "
        "signal): md5 of 64-char windows every 16 chars; windows in >1 "
        "doc counted per doc. Hash-uniform groupBys, no suffix array."
    ),
)
def dedup_substring_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.dedup import substring_dup_stats

    return substring_dup_stats(table(spark, sf_dir, "documents"), k=64, stride=16)


@register(
    "sim_knn_join",
    f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 256
    ), s AS (
      SELECT q.q_id, e.vec_id, {_COS_EXPRS}
      FROM embeddings e CROSS JOIN q WHERE e.vec_id % 97 <> 0
    ), r AS (
      SELECT q_id, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM s
    ), rk AS (
      SELECT q_id, vec_id, cos_sim,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
      FROM r
    )
    SELECT q_id, vec_id, cos_sim, rank FROM rk WHERE rank <= 3 ORDER BY q_id, rank
    """,
    doc=(
        "Batch k-NN join: top-3 cosine neighbors for EVERY sampled query "
        "vector in one pass — broadcast query batch, map-side scoring, "
        "one per-query-id window shuffle."
    ),
)
def knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import knn_join

    return knn_join(table(spark, sf_dir, "embeddings"), query_mod=97, k=3)


@register(
    "text_unigram_logprob",
    f"""
    WITH w AS (SELECT doc_id, unnest({_WORDS}) AS word FROM documents),
    c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
    t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
    v AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT 1000),
    j AS (
      SELECT w.doc_id,
             CASE WHEN v.cnt IS NOT NULL THEN ln(v.cnt / t.total)
                  ELSE ln(0.5 / t.total) END AS lp
      FROM w LEFT JOIN v ON w.word = v.word CROSS JOIN t
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           ROUND(avg(lp), 4) AS mean_logprob
    FROM j GROUP BY doc_id ORDER BY doc_id
    """,
    doc=(
        "CCNet-style perplexity-filter input: per-doc mean unigram "
        "log-prob under the corpus top-1000 unigram model (OOV = "
        "half-count floor); k-row model broadcast, two partial-agg "
        "groupBys."
    ),
)
def unigram_logprob_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import unigram_logprob

    return unigram_logprob(table(spark, sf_dir, "documents"), top_k=1000)


@register(
    "sim_ivf_recall",
    f"""
    WITH q AS (SELECT embedding AS q_emb, label AS q_label FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT e.vec_id, e.label, {_COS_EXPRS}
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
    ), scored AS (
      SELECT vec_id, label, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM s
    ),
    bf AS (SELECT vec_id FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10),
    ivf AS (
      SELECT vec_id FROM scored WHERE label = (SELECT q_label FROM q)
      ORDER BY cos_sim DESC, vec_id LIMIT 10
    )
    SELECT CAST((SELECT count(*) FROM bf WHERE vec_id IN (SELECT vec_id FROM ivf)) AS DOUBLE) / 10.0
           AS recall_at_10
    """,
    doc=(
        "Index self-evaluation: recall@10 of the single-probe IVF search "
        "against the brute-force cosine ground truth for the same query — "
        "the measure-don't-guess gate an ANN index ships with."
    ),
)
def ivf_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from yamon_spark.operators.similarity import cosine_topk, ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    bf = cosine_topk(emb, query_vec_id=0, k=10).select("vec_id")
    ivf = ivf_topk(emb, query_vec_id=0, k=10).select("vec_id")
    return bf.join(ivf, "vec_id", "left_semi").agg(
        (F.count(F.lit(1)).cast("double") / 10.0).alias("recall_at_10")
    )


@register(
    "sim_truncation_recall",
    f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT e.vec_id, {_COS_EXPRS}
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
    ), full_rank AS (
      SELECT vec_id FROM (SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cs FROM s)
      ORDER BY cs DESC, vec_id LIMIT 10
    ),
    qt AS (SELECT q_emb[1:16] AS q_emb FROM q),
    st AS (
      SELECT e2.vec_id,
        list_reduce(list_transform(range(1, 17),
          i -> CAST(e2.embedding[i] AS DOUBLE) * CAST(qt.q_emb[i] AS DOUBLE)), (a, b) -> a + b) AS dot,
        list_reduce(list_transform(e2.embedding[1:16], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS na,
        list_reduce(list_transform(qt.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS nb
      FROM embeddings e2 CROSS JOIN qt WHERE e2.vec_id <> 0
    ), trunc_rank AS (
      SELECT vec_id FROM (SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cs FROM st)
      ORDER BY cs DESC, vec_id LIMIT 10
    )
    SELECT CAST((SELECT count(*) FROM full_rank
                 WHERE vec_id IN (SELECT vec_id FROM trunc_rank)) AS DOUBLE) / 10.0
           AS recall_at_10
    """,
    doc=(
        "Dimension-truncation eval (Matryoshka-style): recall@10 of "
        "16-dim-prefix cosine search against the full 64-dim ground "
        "truth — the accuracy/cost curve that justifies (or rejects) "
        "serving truncated embeddings."
    ),
)
def truncation_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from yamon_spark.operators.similarity import cosine_sim, cosine_topk

    emb = table(spark, sf_dir, "embeddings")
    full = cosine_topk(emb, query_vec_id=0, k=10).select("vec_id")

    q = emb.where(F.col("vec_id") == 0).select(F.slice("embedding", 1, 16).alias("q_emb"))
    trunc = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_sim(F.slice("embedding", 1, 16), F.col("q_emb")), 4).alias("cs"),
        )
        .orderBy(F.col("cs").desc(), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    return full.join(trunc, "vec_id", "left_semi").agg(
        (F.count(F.lit(1)).cast("double") / 10.0).alias("recall_at_10")
    )


@register(
    "sim_ivf_recall_batch",
    """
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
      FROM embeddings WHERE vec_id % 97 = 0
      ORDER BY vec_id LIMIT 256
    ), s AS (
      SELECT q.q_id, q.q_label, e.vec_id, e.label,
        list_reduce(list_transform(range(1, len(e.embedding) + 1),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)), (a, b) -> a + b) AS dot,
        list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS na,
        list_reduce(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS nb
      FROM embeddings e CROSS JOIN q WHERE e.vec_id % 97 <> 0
    ), r AS (
      SELECT q_id, q_label, vec_id, label, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cs FROM s
    ), full_rank AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rk
        FROM r) t WHERE rk <= 10
    ), ivf_rank AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rk
        FROM r WHERE label = q_label) t WHERE rk <= 10
    ), hits AS (
      SELECT fr.q_id, count(ir.vec_id) AS n_hit
      FROM full_rank fr LEFT JOIN ivf_rank ir
        ON fr.q_id = ir.q_id AND fr.vec_id = ir.vec_id
      GROUP BY fr.q_id
    )
    SELECT ROUND(avg(n_hit / 10.0), 4) AS avg_recall_at_10,
           CAST(count(*) AS BIGINT) AS n_queries
    FROM hits
    """,
    doc=(
        "Batch ANN eval: recall@10 of single-probe IVF vs brute force, "
        "averaged over the sampled query batch (capped at the 256 lowest "
        "sampled ids — the knn_join lesson: a modulo sample alone is a "
        "corpus FRACTION, so the uncapped batch made total work "
        "quadratic in data; below the cap — every verification SF — "
        "results are unchanged). r10: both rankings run through the "
        "shared per-partition BLAS top-k kernel, so only batch x 10 "
        "survivor rows per partition ever shuffle."
    ),
)
def ivf_recall_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from yamon_spark.operators.similarity import _batched_blas_topk

    emb = table(spark, sf_dir, "embeddings")
    full_rank = _batched_blas_topk(emb, 97, 10, 256, label_mode=None).select("q_id", "vec_id")
    ivf_rank = _batched_blas_topk(emb, 97, 10, 256, label_mode="only").select(
        F.col("q_id").alias("i_qid"), F.col("vec_id").alias("i_vid")
    )
    hits = (
        full_rank.join(
            # |queries| x 10 rows, bounded by the sampled batch — broadcast
            # so the hit-check never falls back to a sort-merge join
            F.broadcast(ivf_rank),
            (F.col("q_id") == F.col("i_qid")) & (F.col("vec_id") == F.col("i_vid")),
            "left",
        )
        .groupBy("q_id")
        .agg(F.count("i_vid").alias("n_hit"))
    )
    return hits.agg(
        F.round(F.avg(F.col("n_hit") / 10.0), 4).alias("avg_recall_at_10"),
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
    )


@register(
    "train_test_split",
    """
    WITH k AS (
      SELECT doc_id, md5(lower(text) || ':split') AS key FROM documents
    )
    SELECT doc_id,
           ('0x' || substr(key, 1, 8))::BIGINT % 100 AS bucket,
           CASE WHEN ('0x' || substr(key, 1, 8))::BIGINT % 100 < 10
                THEN 'test' ELSE 'train' END AS split
    FROM k ORDER BY doc_id
    """,
    doc=(
        "Leakage-safe deterministic train/test split: buckets key on the "
        "salted md5 of the CONTENT, not the doc id, so exact duplicates "
        "land on the same side (a dup straddling the split inflates "
        "held-out metrics). Pure map-side hash, zero shuffles, "
        "reproducible across engines/retries/cluster sizes."
    ),
)
def train_test_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import train_test_split

    return train_test_split(table(spark, sf_dir, "documents"), test_pct=10, salt="split")


def _kmeans_oracle(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Unrolled Lloyd CTE chain mirroring operators.similarity.
    embedding_kmeans's determinism contract: 4dp-rounded centroids
    between rounds, sequential-fold squared distances, (dist, cluster)
    row_number argmin."""
    sqdist = (
        "list_reduce(list_transform(range(1, {d}), "
        "i -> (v.e[i] - c.carr[i]) * (v.e[i] - c.carr[i])), (a, b) -> a + b)"
    ).format(d=dim + 1)
    parts = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
        " FROM embeddings)",
        f"""c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
             list_transform(e, x -> round(x, 4)) AS carr
      FROM (SELECT * FROM e ORDER BY vec_id LIMIT {k})
    )""",
    ]
    for it in range(1, iters + 1):
        parts.append(f"""a{it} AS (
      SELECT vec_id, e, cluster, dist FROM (
        SELECT s.*, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
        FROM (
          SELECT v.vec_id, v.e, c.cluster, {sqdist} AS dist
          FROM e v CROSS JOIN c{it - 1} c
        ) s
      ) WHERE rn = 1
    )""")
        if it < iters:
            parts.append(f"""c{it} AS (
      SELECT cluster, list(cv ORDER BY dim) AS carr FROM (
        SELECT cluster, d AS dim, round(avg(e[d]), 4) AS cv
        FROM a{it}, range(1, {dim + 1}) t(d)
        GROUP BY cluster, d
      ) GROUP BY cluster
    )""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs, round(avg(dist), 4) AS avg_sqdist
    FROM a{iters} GROUP BY cluster ORDER BY cluster
    """
    )


@register(
    "embed_kmeans",
    _kmeans_oracle(8, 3, 64),
    doc=(
        "Unsupervised Lloyd's k-means over embeddings, unrolled to 3 "
        "iterations (the coarse-quantizer trainer behind the IVF cells): "
        "per-cluster population and mean squared distance. Each round is "
        "one scan against a broadcast <=k-row centroid table with a "
        "map-side-combined (cluster, dim) mean — Spark MLlib KMeans' "
        "per-step cost, no driver collect. 4dp-rounded centroids between "
        "rounds make the iterative float algorithm oracle-exact."
    ),
)
def embed_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import embedding_kmeans

    return embedding_kmeans(table(spark, sf_dir, "embeddings"), k=8, iters=3)


def _pca_power_oracle(dim: int = 64, iters: int = 3) -> str:
    """Unrolled power-iteration CTE chain mirroring operators.similarity.
    embedding_pca_power: 4dp means/Gram cells/iterates, sequential-fold
    dots, list ordering by dim."""
    r = f"range(1, {dim + 1})"
    v0 = round(1.0 / dim**0.5, 4)  # exact at 4dp for dim=64 (0.125)
    parts = [
        "e AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e"
        " FROM embeddings)",
        f"""mu AS (
      SELECT list(m ORDER BY i) AS mu_arr FROM (
        SELECT i, round(avg(e[i]), 4) AS m FROM e, {r} t(i) GROUP BY i
      )
    )""",
        f"c AS (SELECT list_transform({r}, i -> e.e[i] - mu.mu_arr[i]) AS c FROM e, mu)",
        f"""g AS (
      SELECT i, j, round(sum(c[i] * c[j]), 4) AS g
      FROM c, {r} t1(i), {r} t2(j) GROUP BY i, j
    )""",
        "gr AS (SELECT i, list(g ORDER BY j) AS garr FROM g GROUP BY i)",
        f"v0 AS (SELECT list_transform({r}, i -> {v0}) AS varr)",
    ]
    for t in range(1, iters + 1):
        parts.append(f"""s{t} AS (
      SELECT gr.i, list_reduce(list_transform({r}, k -> gr.garr[k] * v.varr[k]),
                               (a, b) -> a + b) AS s
      FROM gr, v{t - 1} v
    )""")
        parts.append(f"""v{t} AS (
      SELECT list_transform(sarr, x -> round(x / nrm, 4)) AS varr FROM (
        SELECT sarr, sqrt(list_reduce(list_transform(sarr, x -> x * x),
                                      (a, b) -> a + b)) AS nrm
        FROM (SELECT list(s ORDER BY i) AS sarr FROM s{t})
      )
    )""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT CAST(i - 1 AS INT) AS dim, varr[i] AS loading
    FROM v{iters}, {r} t(i) ORDER BY dim
    """
    )


@register(
    "embed_pca_power",
    _pca_power_oracle(64, 3),
    doc=(
        "Top principal direction of the embedding cloud: power iteration "
        "on the centered Gram matrix, unrolled to 3 rounds. One scan "
        "builds the d*d Gram from per-row outer products (map-side "
        "combined into 4096 cells); the rounds then touch only those "
        "cells + a broadcast d-vector — the tall-skinny distributed-PCA "
        "decomposition, driver-free, round cost independent of corpus "
        "size. Anisotropy/collapse health check beside embed_kmeans."
    ),
)
def embed_pca_power_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import embedding_pca_power

    return embedding_pca_power(table(spark, sf_dir, "embeddings"), dim=64, iters=3)


@register(
    "source_divergence",
    f"""
    WITH w AS (
      SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ),
    sw AS (SELECT source, w, CAST(count(*) AS DOUBLE) AS c_sw FROM w GROUP BY source, w),
    st AS (SELECT source, sum(c_sw) AS n_s FROM sw GROUP BY source),
    wt AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY w),
    n AS (SELECT sum(c_w) AS n_corpus FROM wt)
    SELECT sw.source, CAST(sum(sw.c_sw) AS BIGINT) AS n_tokens,
           round(sum((sw.c_sw / st.n_s) * log2((sw.c_sw / st.n_s) / (wt.c_w / n.n_corpus))), 4)
             AS kl_bits
    FROM sw JOIN st ON st.source = sw.source JOIN wt ON wt.w = sw.w, n
    GROUP BY sw.source ORDER BY sw.source
    """,
    doc=(
        "Per-source unigram KL divergence vs the whole corpus (bits) — "
        "the distribution-shift gate for a broken/flooded ingestion "
        "source. One (source, word) partial agg joins word totals on the "
        "uniform word key plus two broadcast totals; per-source sum is a "
        "|sources|-row agg."
    ),
)
def source_divergence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import source_divergence

    return source_divergence(table(spark, sf_dir, "documents"))


@register(
    "source_overlap",
    f"""
    WITH sh AS (
      SELECT DISTINCT source, md5(g) AS g FROM (
        SELECT source, unnest(list_distinct(list_transform(
          range(1, greatest(len({_WORDS}) - 7, 1) + 1),
          i -> array_to_string(({_WORDS})[i:i+7], ' ')))) AS g
        FROM documents)
    )
    SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
    GROUP BY a.source, b.source ORDER BY src_a, src_b
    """,
    doc=(
        "Cross-source 8-gram overlap matrix: distinct shingles shared by "
        "each source pair — catches one feed republishing another's text "
        "before domain weights double-count content. Posting-list groupBy "
        "on the uniform md5 shingle key; result bounded by |sources|^2. "
        "Integer-exact."
    ),
)
def source_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import source_overlap

    return source_overlap(table(spark, sf_dir, "documents"), ngram=8)


@register(
    "text_tfidf_pairs",
    f"""
    WITH w AS (SELECT doc_id, unnest({_WORDS}) AS w FROM documents),
    tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY doc_id, w),
    df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    wt AS (
      SELECT tf.doc_id, tf.w,
             tf.tf * CAST(round(ln(n.n_docs / df.df) * 1000) AS BIGINT) AS wt
      FROM tf JOIN df ON df.w = tf.w, n
      WHERE df.df BETWEEN 2 AND 100),
    nrm AS (SELECT doc_id, sum(wt * wt) AS n2 FROM wt GROUP BY doc_id),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.wt * b.wt) AS dot
      FROM wt a JOIN wt b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    c AS (
      SELECT doc_a, doc_b,
             round(dot / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) AS cosine
      FROM dots JOIN nrm na ON na.doc_id = doc_a JOIN nrm nb ON nb.doc_id = doc_b)
    SELECT doc_a, doc_b, cosine FROM c WHERE cosine >= 0.15
    ORDER BY cosine DESC, doc_a, doc_b
    """,
    doc=(
        "Sparse TF-IDF cosine document pairs via df-pruned inverted "
        "index (never all-pairs; stop-like terms with df > 100 dropped "
        "before the posting self-join). Integer-quantized idf makes "
        "weights/dots/norms summation-order-exact; the only float math "
        "is one division+sqrt on exact integers."
    ),
)
def text_tfidf_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import tfidf_pairs

    return tfidf_pairs(table(spark, sf_dir, "documents"))


@register(
    "text_ngram_novelty",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, md5(g) AS g FROM (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(len({_WORDS}) - 7, 1) + 1),
          i -> array_to_string(({_WORDS})[i:i+7], ' ')))) AS g
        FROM documents)),
    fst AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g),
    novel AS (SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
              FROM fst GROUP BY first_doc),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM sh GROUP BY doc_id)
    SELECT t.doc_id, t.n_shingles,
           CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(coalesce(n.n_novel, 0) AS DOUBLE) / t.n_shingles AS novelty
    FROM tot t LEFT JOIN novel n ON n.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
    doc=(
        "Per-doc 8-gram novelty (fraction of its distinct shingles first "
        "seen in it, by doc_id order) — the redundancy curve for whether "
        "new ingest still adds unseen content. First-owner is one "
        "uniform-md5-key groupBy; per-doc totals are |docs|-row aggs "
        "joined on doc_id, no posting-list join back. int/int division, "
        "unrounded."
    ),
)
def text_ngram_novelty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import ngram_novelty

    return ngram_novelty(table(spark, sf_dir, "documents"), ngram=8)


@register(
    "sample_weighted",
    """
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
             ln((CAST('0x' || substr(md5(doc_id || ':aes'), 1, 8) AS BIGINT) + 0.5)
                / 4294967296.0)
               / greatest(CAST(n_chars AS DOUBLE), 1.0) AS k
      FROM documents
      ORDER BY k DESC, doc_id LIMIT 50)
    ORDER BY doc_id
    """,
    doc=(
        "Deterministic Efraimidis-Spirakis weighted sampling without "
        "replacement (key = ln(md5-uniform)/n_chars, top-50) — the "
        "reproducible 'sample N docs weighted by length' subsampler. "
        "Map-side key projection + TakeOrderedAndProject: reduction "
        "traffic is n*partitions rows regardless of corpus size."
    ),
)
def sample_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import sample_weighted

    return sample_weighted(table(spark, sf_dir, "documents"), n=50)


@register(
    "text_boilerplate",
    f"""
    WITH segs AS (
      SELECT doc_id, md5(s) AS seg FROM (
        SELECT doc_id, unnest(list_transform(
          range(0, CAST(floor(len({_WORDS}) / 8) AS BIGINT)),
          j -> array_to_string(({_WORDS})[j*8+1 : j*8+8], ' '))) AS s
        FROM documents WHERE len({_WORDS}) >= 8) t),
    freq AS (SELECT seg, count(DISTINCT doc_id) AS n_docs FROM segs GROUP BY seg),
    boiler AS (SELECT seg FROM freq WHERE n_docs >= 2),
    per AS (
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
      FROM segs s LEFT JOIN boiler b ON b.seg = s.seg GROUP BY s.doc_id)
    SELECT doc_id, n_segments, n_boiler,
           CAST(n_boiler AS DOUBLE) / n_segments AS boiler_frac
    FROM per ORDER BY doc_id
    """,
    doc=(
        "Per-doc boilerplate fraction via cross-doc segment frequency "
        "(CCNet-style repeated-paragraph filter; unit = non-overlapping "
        "8-word segment, boilerplate = present in >=2 distinct docs). "
        "Uniform md5 segment keys partial-agg map-side; the flag join "
        "touches only the boilerplate key set. int/int division, "
        "unrounded."
    ),
)
def text_boilerplate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import boilerplate_report

    return boilerplate_report(table(spark, sf_dir, "documents"), seg_words=8, min_docs=2)


@register(
    "shard_balance_report",
    f"""
    WITH per AS (
      SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 8)
                   AS BIGINT) % 16 AS INT) AS shard,
             len({_WORDS}) AS tokens
      FROM documents),
    g AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(tokens) AS BIGINT) AS n_tokens
          FROM per GROUP BY shard),
    t AS (SELECT sum(n_tokens) AS total_tokens FROM g)
    SELECT shard, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) * 16 / total_tokens, 4) AS load_ratio
    FROM g, t ORDER BY shard
    """,
    doc=(
        "Training-shard placement audit: salted-hash shard assignment "
        "(16 shards) with realized per-shard doc/token loads and each "
        "shard's token load vs the ideal 1/n share. One map-side hash "
        "projection + 16-group partial agg; total is a 1-row broadcast "
        "cross join."
    ),
)
def shard_balance_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import shard_balance

    return shard_balance(table(spark, sf_dir, "documents"), n_shards=16)


@register(
    "dedup_survivors",
    f"""
    WITH m AS (
      SELECT c.cluster_id, d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
      FROM ({_CLUSTER_ORACLE}) c JOIN documents d ON d.doc_id = c.doc_id),
    g AS (
      SELECT cluster_id, max(n_chars) AS mc,
             CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM m GROUP BY cluster_id),
    s AS (
      SELECT m.cluster_id, min(m.doc_id) AS survivor_doc_id
      FROM m JOIN g ON g.cluster_id = m.cluster_id AND m.n_chars = g.mc
      GROUP BY m.cluster_id)
    SELECT g.cluster_id, s.survivor_doc_id, g.n_members,
           CAST(g.n_members - 1 AS BIGINT) AS n_dropped,
           CAST(g.total_chars - g.mc AS BIGINT) AS chars_dropped
    FROM g JOIN s ON s.cluster_id = g.cluster_id
    ORDER BY g.cluster_id
    """,
    doc=(
        "Survivor selection + impact report per near-dup cluster "
        "(longest text then min doc_id — dedup_canonical's policy on "
        "the CC labels): the reviewable 'what will dedup actually drop' "
        "plan. Two cluster-keyed partial aggs + one hash join back; no "
        "windows."
    ),
)
def dedup_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import dedup_survivors

    return dedup_survivors(table(spark, sf_dir, "documents"), ngram=3, threshold=0.5)


@register(
    "curriculum_plan",
    """
    WITH s AS (
      SELECT round(ln(1 + len(""" + _WORDS + """)) *
                   (CAST(n_chars AS DOUBLE) / len(""" + _WORDS + """)), 6) AS score,
             n_chars // 4 + 1 AS toks
      FROM documents
    ),
    b AS (
      SELECT quantile_cont(score, 0.25) AS b1,
             quantile_cont(score, 0.50) AS b2,
             quantile_cont(score, 0.75) AS b3
      FROM s
    ),
    st AS (
      SELECT 1 + CAST(score > b1 AS INT) + CAST(score > b2 AS INT)
               + CAST(score > b3 AS INT) AS stage,
             score, toks
      FROM s, b
    ),
    g AS (
      SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS tokens,
             round(min(score), 4) AS min_score,
             round(max(score), 4) AS max_score
      FROM st GROUP BY stage
    )
    SELECT stage, n_docs, tokens,
           round(CAST(tokens AS DOUBLE) /
                 (SELECT CAST(sum(tokens) AS DOUBLE) FROM g), 4) AS token_share,
           min_score, max_score
    FROM g ORDER BY stage
    """,
    doc=(
        "Curriculum schedule: the corpus bucketed into 4 training "
        "stages by a difficulty proxy (ln(1+words) x avg word chars — "
        "simple/short first), with each stage's doc count, token mass "
        "and share. Stage assignment via exact score quantiles "
        "broadcast as ONE row (the q28 percentile-parity precedent) — "
        "two partial-agg corpus scans, no ntile, no global sort, no "
        "data-sized window."
    ),
)
def curriculum_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import curriculum_plan

    return curriculum_plan(table(spark, sf_dir, "documents"), n_stages=4)


@register(
    "curriculum_mix",
    """
    WITH s AS (
      SELECT source,
             round(ln(1 + len(""" + _WORDS + """)) *
                   (CAST(n_chars AS DOUBLE) / len(""" + _WORDS + """)), 6) AS score,
             n_chars // 4 + 1 AS toks
      FROM documents
    ),
    b AS (
      SELECT quantile_cont(score, 0.25) AS b1,
             quantile_cont(score, 0.50) AS b2,
             quantile_cont(score, 0.75) AS b3
      FROM s
    ),
    st AS (
      SELECT 1 + CAST(score > b1 AS INT) + CAST(score > b2 AS INT)
               + CAST(score > b3 AS INT) AS stage,
             source, toks
      FROM s, b
    ),
    cell AS (
      SELECT stage, source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS tokens
      FROM st GROUP BY stage, source
    ),
    tot AS (
      SELECT stage, CAST(sum(tokens) AS DOUBLE) AS stage_toks
      FROM cell GROUP BY stage
    )
    SELECT cell.stage, cell.source, cell.n_docs, cell.tokens,
           round(CAST(cell.tokens AS DOUBLE) / tot.stage_toks, 4) AS stage_share
    FROM cell JOIN tot ON tot.stage = cell.stage
    ORDER BY cell.stage, cell.source
    """,
    doc=(
        "Curriculum x domain-mix schedule: per (stage, source) token "
        "mass and within-stage share — catches a difficulty-staged "
        "curriculum silently concentrating one source into a stage. "
        "Same broadcast-quantile stage assignment as curriculum_plan "
        "plus one (stage, source) partial agg and an n_stages-row "
        "totals broadcast; two corpus scans, no windows."
    ),
)
def curriculum_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import curriculum_mix

    return curriculum_mix(table(spark, sf_dir, "documents"), n_stages=4)
