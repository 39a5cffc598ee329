"""Declared queries for the round-5 training-data additions: tokenizer
statistics (BPE pair counts), corpus health (Zipf slope), classifier-style
quality scoring, CCNet-style perplexity bucketing, DSIR importance
weights, and MMR-diversified retrieval.

These extend the beyond-reference inventory (SURVEY §2 'beyond the
reference'): the quantities a large-scale LLM training pipeline computes
between raw documents and a training mix, each with a DuckDB oracle.

Determinism contract (FIXTURES.md): doubles downstream of cross-partition
float sums round to 4; greedy selections (MMR) operate on ROUNDED values
with vec_id tiebreaks so the selection sequence is engine-deterministic;
hash bucketing uses the portable md5-hex-prefix hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from yamon_spark.queries import register, table
from yamon_spark.queries.pipeline_ops import _COS_EXPRS, _STOP_SQL, _WORDS

_WORDS_LC = r"regexp_split_to_array(trim(lower(text)), '\s+')"


@register(
    "text_zipf_slope",
    f"""
    WITH w AS (SELECT unnest({_WORDS_LC}) AS w FROM documents),
    c AS (SELECT w, count(*) AS cnt FROM w GROUP BY w),
    r AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, w) AS DOUBLE)) AS x,
             ln(CAST(cnt AS DOUBLE)) AS y
      FROM c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           round(regr_slope(y, x), 4) AS zipf_slope
    FROM r
    """,
    doc=(
        "Zipf-law OLS slope of ln(freq) vs ln(rank) over the corpus "
        "unigram table — a one-row naturalness gauge for a training mix."
    ),
)
def zipf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import zipf_slope

    return zipf_slope(table(spark, sf_dir, "documents"))


@register(
    "bpe_pair_counts",
    f"""
    WITH w AS (SELECT unnest({_WORDS_LC}) AS w FROM documents),
    wc AS (SELECT w, count(*) AS c FROM w GROUP BY w),
    p AS (
      SELECT unnest(list_transform(range(1, length(w)),
               i -> substr(w, CAST(i AS INTEGER), 2))) AS pair, c
      FROM wc WHERE length(w) >= 2
    )
    SELECT pair, CAST(sum(c) AS BIGINT) AS n
    FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 50
    """,
    doc=(
        "BPE tokenizer training's inner statistic: corpus-weighted "
        "adjacent character-pair counts over the distinct-word frequency "
        "table (top-50 = the first merge candidates)."
    ),
)
def bpe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import bpe_pair_counts

    return bpe_pair_counts(table(spark, sf_dir, "documents"), top_n=50)


def _logit_train_ctes(iters: int, lr: float) -> tuple[list[str], str]:
    """Unrolled gradient-descent CTE chain mirroring
    operators.curation.quality_logit_train: raw features -> 4dp-rounded
    standardization stats -> z-scored features, then per round one
    gradient CTE (mean gradients rounded 6dp) and one weight CTE
    (weights rounded 4dp), with identical expression association to the
    Spark side."""
    z = "(w0 + w1 * x1 + w2 * x2 + w3 * x3)"
    p = f"(1.0 / (1.0 + exp(-{z})))"
    ctes = [
        f"""rawf AS (
      SELECT CASE WHEN len(w) < 10 THEN 0.0 WHEN len(w) > 1000 THEN 0.0
                  WHEN (list_reduce(list_transform(w, x -> CAST(length(x) AS DOUBLE)),
                        (a, b) -> a + b) / len(w)) < 2.0
                    OR (list_reduce(list_transform(w, x -> CAST(length(x) AS DOUBLE)),
                        (a, b) -> a + b) / len(w)) > 12.0 THEN 0.0
                  WHEN (CAST(len(list_filter(w, x -> {_STOP_SQL})) AS DOUBLE) / len(w)) < 0.01
                    THEN 0.0
                  ELSE 1.0 END AS y,
             ln(CAST(len(w) AS DOUBLE)) AS x1,
             list_reduce(list_transform(w, x -> CAST(length(x) AS DOUBLE)),
               (a, b) -> a + b) / len(w) AS x2,
             CAST(len(list_filter(w, x -> {_STOP_SQL})) AS DOUBLE) / len(w) AS x3
      FROM (SELECT {_WORDS} AS w FROM documents) WHERE len(w) >= 1
    )""",
        """stats AS (
      SELECT round(avg(x1), 4) AS m1, round(avg(x2), 4) AS m2, round(avg(x3), 4) AS m3,
             round(stddev_pop(x1), 4) AS s1, round(stddev_pop(x2), 4) AS s2,
             round(stddev_pop(x3), 4) AS s3
      FROM rawf
    )""",
        """feats AS MATERIALIZED (
      SELECT y,
             (x1 - m1) / (CASE WHEN s1 = 0.0 THEN 1.0 ELSE s1 END) AS x1,
             (x2 - m2) / (CASE WHEN s2 = 0.0 THEN 1.0 ELSE s2 END) AS x2,
             (x3 - m3) / (CASE WHEN s3 = 0.0 THEN 1.0 ELSE s3 END) AS x3
      FROM rawf, stats
    )""",
        "wt0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)",
    ]
    # one CTE per round, previous weights referenced exactly ONCE (the
    # update folds into the gradient aggregate via first() on the
    # constant weight columns) — a separate gradient CTE would inline
    # wt{t-1} twice per round and blow up 2^iters in both engines
    for t in range(1, iters + 1):
        ctes.append(
            f"""wt{t} AS (
      SELECT round(first(w0) - {lr} * round(avg(({p} - y) * 1.0), 6), 4) AS w0,
             round(first(w1) - {lr} * round(avg(({p} - y) * x1), 6), 4) AS w1,
             round(first(w2) - {lr} * round(avg(({p} - y) * x2), 6), 4) AS w2,
             round(first(w3) - {lr} * round(avg(({p} - y) * x3), 6), 4) AS w3
      FROM feats, wt{t - 1}
    )"""
        )
    return ctes, p


def _logit_train_oracle(iters: int = 12, lr: float = 4.0) -> str:
    ctes, p = _logit_train_ctes(iters, lr)
    return f"""
    WITH {", ".join(ctes)}
    SELECT term, value FROM (
      SELECT 'w0_intercept' AS term, w0 AS value FROM wt{iters}
      UNION ALL SELECT 'w1_ln_words', w1 FROM wt{iters}
      UNION ALL SELECT 'w2_avg_word_len', w2 FROM wt{iters}
      UNION ALL SELECT 'w3_stop_ratio', w3 FROM wt{iters}
      UNION ALL
      SELECT 'train_acc',
             round(avg(CASE WHEN ({p} >= 0.5) = (y >= 0.5) THEN 1.0 ELSE 0.0 END), 4)
      FROM feats, wt{iters}
    ) ORDER BY term
    """


def _logit_calibration_oracle(iters: int = 12, lr: float = 4.0, n_bins: int = 10) -> str:
    """Reliability-bin oracle over the SAME unrolled training chain:
    bin = floor(round(p,4)*n_bins) clamped to the top bin, computed in
    IEEE double on both engines (identical bits, identical bin)."""
    ctes, p = _logit_train_ctes(iters, lr)
    p4 = f"round({p}, 4)"
    return f"""
    WITH {", ".join(ctes)}
    SELECT CAST(least(floor({p4} * {n_bins}), {n_bins - 1}) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg({p4}), 4) AS mean_pred,
           round(avg(y), 4) AS frac_keep
    FROM feats, wt{iters}
    GROUP BY 1 ORDER BY 1
    """


def _logit_threshold_sweep_oracle(iters: int = 12, lr: float = 4.0) -> str:
    """Threshold-sweep oracle over the SAME unrolled training chain:
    thresholds are i/10.0 in IEEE double on both engines, predictions
    compare at 4dp, F1 via the harmonic identity 2tp/(2tp+fp+fn)."""
    ctes, p = _logit_train_ctes(iters, lr)
    return f"""
    WITH {", ".join(ctes)},
    scored AS (SELECT y, round({p}, 4) AS p4 FROM feats, wt{iters}),
    ts AS (SELECT unnest(list_transform(range(1, 10), i -> i / 10.0)) AS t),
    c AS (
      SELECT t,
             sum(CASE WHEN p4 >= t THEN y ELSE 0.0 END) AS tp,
             sum(CASE WHEN p4 >= t THEN 1.0 - y ELSE 0.0 END) AS fp,
             sum(CASE WHEN p4 < t THEN y ELSE 0.0 END) AS fn
      FROM scored, ts GROUP BY t
    )
    SELECT t AS threshold, CAST(tp + fp AS BIGINT) AS n_kept,
           CASE WHEN tp + fp > 0 THEN round(tp / (tp + fp), 4) END AS prec,
           CASE WHEN tp + fn > 0 THEN round(tp / (tp + fn), 4) END AS rec,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN round(2 * tp / (2 * tp + fp + fn), 4) END AS f1
    FROM c ORDER BY threshold
    """


def _logit_model_oracle(iters: int = 12, lr: float = 4.0) -> str:
    """The deployable model row: z-score stats + trained weights from
    the same unrolled chain."""
    ctes, _ = _logit_train_ctes(iters, lr)
    return f"""
    WITH {", ".join(ctes)}
    SELECT m1, m2, m3, s1, s2, s3, w0, w1, w2, w3 FROM stats, wt{iters}
    """


@register(
    "quality_head_model",
    _logit_model_oracle(12, 4.0),
    doc=(
        "The trained quality head as a DEPLOYABLE 1-row artifact: the "
        "z-score training stats alongside the learned weights — what a "
        "serving path (quality_head_score, the streaming corpus "
        "pipeline's at-ingest stamp) broadcasts. Scoring new docs needs "
        "the TRAINING stats, not the serving corpus's; persisting them "
        "together is what makes the head portable."
    ),
)
def quality_head_model_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import quality_head_fit

    return quality_head_fit(table(spark, sf_dir, "documents"), iters=12, lr=4.0)


@register(
    "quality_threshold_sweep",
    _logit_threshold_sweep_oracle(12, 4.0),
    doc=(
        "Operating-point selection for the trained quality head — the "
        "step after calibration: sweep keep-thresholds 0.1..0.9 over "
        "the head's 4dp-rounded predictions and report per threshold "
        "the surviving doc count and precision/recall/F1 against the "
        "rule gate. One conditional-sum aggregate (27 cells) + a 1-row "
        "stack — no per-threshold rescans; the table a pipeline owner "
        "reads to pick THE threshold before the head drops data."
    ),
)
def quality_threshold_sweep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import quality_threshold_sweep

    return quality_threshold_sweep(table(spark, sf_dir, "documents"), iters=12, lr=4.0)


@register(
    "quality_logit_train",
    _logit_train_oracle(12, 4.0),
    doc=(
        "Train the linear quality head in-engine: logistic regression "
        "by unrolled batch gradient descent distilling the rule gate's "
        "keep verdict into the three quality_logit features, z-scored "
        "against 4dp-rounded corpus stats (unscaled GD stalls at the "
        "majority predictor; standardized it reaches ~99%). Per round "
        "ONE scan vs a broadcast 1-row weight frame (MLlib's per-step "
        "aggregator cost), gradients rounded 6dp and weights 4dp per "
        "round so iterates are engine-deterministic; emits the learned "
        "weights and final training accuracy."
    ),
)
def quality_logit_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import quality_logit_train

    return quality_logit_train(table(spark, sf_dir, "documents"), iters=12, lr=4.0)


@register(
    "quality_head_calibration",
    _logit_calibration_oracle(12, 4.0, 10),
    doc=(
        "Reliability diagram for the trained quality head: re-run the "
        "unrolled-GD training chain, bin every doc by its 4dp-rounded "
        "predicted keep-probability into 10 deciles, and report per bin "
        "(count, mean prediction, observed keep fraction vs the rule "
        "gate). The evidence a mixing pipeline needs before thresholding "
        "on the score — training accuracy alone can hide a head that is "
        "confidently wrong in one probability band. Bin edges "
        "floor(round(p,4)*10) compute in IEEE double on both engines."
    ),
)
def quality_head_calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import quality_head_calibration

    return quality_head_calibration(table(spark, sf_dir, "documents"), iters=12, lr=4.0, n_bins=10)


@register(
    "quality_head_ece",
    f"""
    WITH cal AS ({_logit_calibration_oracle(12, 4.0, 10)})
    SELECT CAST(count(*) AS BIGINT) AS n_bins_occupied,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           round(sum(n_docs * abs(mean_pred - frac_keep))
                 / CAST(sum(n_docs) AS DOUBLE), 4) AS ece
    FROM cal
    """,
    doc=(
        "Expected calibration error of the trained quality head — the "
        "single number the reliability diagram reduces to: the doc-"
        "weighted mean |mean_pred - frac_keep| across occupied bins. "
        "The gate a pipeline alarms on (ECE drifting up means the "
        "head's probabilities stopped meaning what the threshold sweep "
        "assumed). One extra <=n_bins-row aggregate over the "
        "calibration plan."
    ),
)
def quality_head_ece_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from yamon_spark.operators.curation import quality_head_calibration

    cal = quality_head_calibration(table(spark, sf_dir, "documents"), iters=12, lr=4.0, n_bins=10)
    return cal.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins_occupied"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.round(
            F.sum(F.col("n_docs") * F.abs(F.col("mean_pred") - F.col("frac_keep")))
            / F.sum("n_docs").cast("double"),
            4,
        ).alias("ece"),
    )


@register(
    "quality_logit",
    f"""
    WITH t AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    f AS (
      SELECT doc_id,
        CAST(len(w) AS DOUBLE) AS n_words,
        list_reduce(list_transform(w, x -> CAST(length(x) AS DOUBLE)), (a, b) -> a + b)
          / len(w) AS avg_word_len,
        CAST(len(list_filter(w, x -> {_STOP_SQL})) AS DOUBLE) / len(w) AS stop_ratio
      FROM t
    ),
    z AS (
      SELECT doc_id,
             (((-1.5 + 0.8 * ln(n_words)) + (-0.3 * avg_word_len))
              + (6.0 * stop_ratio)) AS z
      FROM f
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-z)), 4) AS quality_score,
           CAST(CASE WHEN round(1.0 / (1.0 + exp(-z)), 4) >= 0.5
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM z ORDER BY doc_id
    """,
    doc=(
        "Fixed-weight logistic quality head over the rule gate's features "
        "— the calibrated [0,1] score a mixing pipeline thresholds on."
    ),
)
def quality_logit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import quality_logit

    return quality_logit(table(spark, sf_dir, "documents"))


@register(
    "text_perplexity_buckets",
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
    ),
    scored AS (
      SELECT doc_id, ROUND(avg(lp), 4) AS mean_logprob
      FROM j GROUP BY doc_id
    ),
    cuts AS (
      SELECT round(quantile_cont(mean_logprob, 1.0/3.0), 4) AS t_low,
             round(quantile_cont(mean_logprob, 2.0/3.0), 4) AS t_high
      FROM scored WHERE doc_id % 20 = 0
    )
    SELECT doc_id, mean_logprob,
           CASE WHEN mean_logprob >= t_high THEN 'head'
                WHEN mean_logprob >= t_low THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored CROSS JOIN cuts ORDER BY doc_id
    """,
    doc=(
        "CCNet-style head/middle/tail split: unigram-LM doc scores, "
        "tercile cutoffs learned from a deterministic doc_id-hash sample, "
        "map-side bucket assignment against the broadcast cutoffs."
    ),
)
def perplexity_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import perplexity_buckets

    return perplexity_buckets(table(spark, sf_dir, "documents"), top_k=1000, sample_mod=20)


@register(
    "dsir_weights",
    f"""
    WITH w AS (
      SELECT doc_id, source, unnest({_WORDS_LC}) AS w FROM documents
    ),
    wb AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(w), 1, 6))::BIGINT % 256 AS bucket
      FROM w
    ),
    raw AS (SELECT bucket, count(*) AS c_raw FROM wb GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS c_tgt FROM wb WHERE source = 'src0' GROUP BY bucket),
    tot AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_raw,
             CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS DOUBLE) AS n_tgt
      FROM wb
    ),
    model AS (
      SELECT r.bucket,
             (ln((COALESCE(t.c_tgt, 0) + 0.5) / (n_tgt + 128.0))
              - ln((r.c_raw + 0.5) / (n_raw + 128.0))) AS llr
      FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket CROSS JOIN tot
    )
    SELECT wb.doc_id, CAST(count(*) AS BIGINT) AS n_words,
           ROUND(sum(model.llr), 4) AS log_weight
    FROM wb JOIN model ON wb.bucket = model.bucket
    GROUP BY wb.doc_id ORDER BY wb.doc_id
    """,
    doc=(
        "DSIR importance weights: per-doc log-likelihood ratio between a "
        "target-domain (source='src0') hashed-unigram model and the raw "
        "corpus model; both models are 256-row broadcasts."
    ),
)
def dsir_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import dsir_weights

    return dsir_weights(table(spark, sf_dir, "documents"), target_source="src0", n_buckets=256)


_PAIR_COS = """
      list_reduce(list_transform(range(1, len(a.embedding) + 1),
        ix -> CAST(a.embedding[ix] AS DOUBLE) * CAST(b.embedding[ix] AS DOUBLE)), (x, y) -> x + y) AS dot,
      list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y) AS na,
      list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y) AS nb
"""


def _mmr_oracle(k: int = 10, pool: int = 30) -> str:
    """Unrolled greedy-MMR oracle: sel{r} picks the argmax of
    0.7*rel - 0.3*max_sim(candidate, selected so far) among unselected
    candidates — the same k steps the Spark operator unrolls, in SQL."""
    parts = [
        f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT e.vec_id, e.embedding, {_COS_EXPRS}
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
    ),
    cand AS MATERIALIZED (
      SELECT vec_id, embedding, round(dot / (sqrt(na) * sqrt(nb)), 4) AS rel
      FROM s ORDER BY rel DESC, vec_id LIMIT {pool}
    ),
    p0 AS (
      SELECT a.vec_id AS i, b.vec_id AS j, {_PAIR_COS}
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    pairs AS MATERIALIZED (SELECT i, j, round(dot / (sqrt(na) * sqrt(nb)), 4) AS s FROM p0),
    sel1 AS MATERIALIZED (
      SELECT CAST(1 AS INT) AS rank, vec_id, rel, rel AS mmr_score
      FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    ),
    selall1 AS MATERIALIZED (SELECT vec_id FROM sel1)"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f""",
    sel{r} AS MATERIALIZED (
      SELECT CAST({r} AS INT) AS rank, c.vec_id, c.rel,
             round(0.7 * c.rel - 0.3 * m.mx, 4) AS mmr_score
      FROM cand c JOIN (
        SELECT i, max(s) AS mx FROM pairs
        WHERE j IN (SELECT vec_id FROM selall{r - 1}) GROUP BY i
      ) m ON c.vec_id = m.i
      WHERE c.vec_id NOT IN (SELECT vec_id FROM selall{r - 1})
      ORDER BY mmr_score DESC, c.vec_id LIMIT 1
    ),
    selall{r} AS MATERIALIZED (
      SELECT vec_id FROM selall{r - 1} UNION ALL SELECT vec_id FROM sel{r}
    )"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM sel{r}" for r in range(1, k + 1))
    parts.append(f"\n    SELECT rank, vec_id, rel, mmr_score FROM ({union}) ORDER BY rank")
    return "".join(parts)


@register(
    "sim_mmr_topk",
    _mmr_oracle(k=10, pool=30),
    doc=(
        "Maximal-marginal-relevance rerank: greedy top-10 from the "
        "cosine top-30 pool maximizing 0.7*rel - 0.3*max_sim(selected) "
        "— keeps a retrieval context from filling with near-duplicates."
    ),
)
def mmr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import mmr_topk

    return mmr_topk(table(spark, sf_dir, "embeddings"), query_vec_id=0, k=10, pool=30)


def _semantic_dedup_oracle(threshold: float = 0.95, n_planes: int = 6, dim: int = 64) -> str:
    from yamon_spark.queries.pipeline_ops import lsh_bucket_sql

    bucket_terms = lsh_bucket_sql(n_planes, dim)
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bucket_terms} AS bucket FROM embeddings),
    c AS (SELECT bucket, min(vec_id) AS canon_id FROM b GROUP BY bucket),
    ce AS (
      SELECT c.bucket, c.canon_id, b.embedding AS canon_emb
      FROM c JOIN b ON b.vec_id = c.canon_id
    ),
    s AS (
      SELECT b.vec_id, CAST(b.bucket AS BIGINT) AS bucket, ce.canon_id,
        list_reduce(list_transform(range(1, len(b.embedding) + 1),
          ix -> CAST(b.embedding[ix] AS DOUBLE) * CAST(ce.canon_emb[ix] AS DOUBLE)), (x, y) -> x + y) AS dot,
        list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y) AS na,
        list_reduce(list_transform(ce.canon_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y) AS nb
      FROM b JOIN ce ON b.bucket = ce.bucket
    )
    SELECT vec_id, bucket, canon_id,
           round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_to_canon,
           CAST(CASE WHEN vec_id = canon_id
                       OR round(dot / (sqrt(na) * sqrt(nb)), 4) < {threshold}
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM s ORDER BY vec_id
    """


@register(
    "dedup_semantic",
    _semantic_dedup_oracle(),
    doc=(
        "SemDeDup-style keep/drop verdict: hyperplane-bucket clusters, "
        "min-vec_id anchor per cluster, drop members with cosine >= 0.95 "
        "to their anchor. Linear cost — no pairwise term."
    ),
)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import semantic_dedup

    return semantic_dedup(table(spark, sf_dir, "embeddings"), threshold=0.95, n_planes=6)


_SQ8_STATS = """
    ex AS (
      SELECT CAST(d AS INT) AS dim, CAST(embedding[d] AS DOUBLE) AS v
      FROM embeddings, range(1, 65) t(d)
    ),
    st AS MATERIALIZED (
      SELECT list(mn ORDER BY dim) AS mins, list(mx ORDER BY dim) AS maxs
      FROM (SELECT dim, min(v) AS mn, max(v) AS mx FROM ex GROUP BY dim)
    ),
    enc AS MATERIALIZED (
      SELECT e.vec_id, e.embedding,
        list_transform(range(1, len(e.embedding) + 1), i ->
          CASE WHEN st.maxs[i] = st.mins[i] THEN 0
               ELSE CAST(least(255.0, greatest(0.0,
                    floor((CAST(e.embedding[i] AS DOUBLE) - st.mins[i])
                          / (st.maxs[i] - st.mins[i]) * 255.0 + 0.5))) AS INTEGER)
          END) AS codes
      FROM embeddings e CROSS JOIN st
    ),
    dec AS MATERIALIZED (
      SELECT enc.vec_id, enc.embedding, enc.codes,
        list_transform(range(1, len(enc.codes) + 1), i ->
          st.mins[i] + CAST(enc.codes[i] AS DOUBLE) / 255.0 * (st.maxs[i] - st.mins[i])) AS recon
      FROM enc CROSS JOIN st
    )
"""


@register(
    "sq8_codes",
    f"""
    WITH {_SQ8_STATS},
    f AS (
      SELECT vec_id,
        list_reduce(list_transform(codes, c -> CAST(c AS BIGINT)), (a, b) -> a + b) AS code_sum,
        list_reduce(list_transform(range(1, len(recon) + 1),
          ix -> recon[ix] * CAST(embedding[ix] AS DOUBLE)), (x, y) -> x + y) AS dot,
        list_reduce(list_transform(recon, x -> x * x), (x, y) -> x + y) AS na,
        list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y) AS nb
      FROM dec
    )
    SELECT vec_id, code_sum, round(dot / (sqrt(na) * sqrt(nb)), 4) AS recon_cos
    FROM f ORDER BY vec_id
    """,
    doc=(
        "SQ8 scalar quantization round-trip: per-dim min/max learned from "
        "the corpus (one broadcast row), int8-range codes, reconstruction "
        "cosine per vector — the 4x-compression encode check."
    ),
)
def sq8_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import sq8_fidelity

    return sq8_fidelity(table(spark, sf_dir, "embeddings"))


@register(
    "sim_sq8_topk",
    f"""
    WITH {_SQ8_STATS},
    q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT d.vec_id,
        list_reduce(list_transform(range(1, len(d.recon) + 1),
          ix -> d.recon[ix] * CAST(q.q_emb[ix] AS DOUBLE)), (x, y) -> x + y) AS dot,
        list_reduce(list_transform(d.recon, x -> x * x), (x, y) -> x + y) AS na,
        list_reduce(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y) AS nb
      FROM dec d CROSS JOIN q WHERE d.vec_id <> 0
    )
    SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim
    FROM s ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    doc=(
        "ANN top-10 in SQ8-decoded space: full-precision query against "
        "the 4x-compressed corpus (asymmetric scoring, pq_topk's ADC "
        "shape with a scalar codebook)."
    ),
)
def sim_sq8_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import sq8_topk

    return sq8_topk(table(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


@register(
    "sim_sq8_recall",
    f"""
    WITH {_SQ8_STATS},
    q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    sb AS (
      SELECT e.vec_id, {_COS_EXPRS}
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
    ),
    truth AS (
      SELECT vec_id FROM (
        SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cs FROM sb)
      ORDER BY cs DESC, vec_id LIMIT 10
    ),
    sa AS (
      SELECT d.vec_id,
        list_reduce(list_transform(range(1, len(d.recon) + 1),
          ix -> d.recon[ix] * CAST(q.q_emb[ix] AS DOUBLE)), (x, y) -> x + y) AS dot,
        list_reduce(list_transform(d.recon, x -> x * x), (x, y) -> x + y) AS na,
        list_reduce(list_transform(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y) AS nb
      FROM dec d CROSS JOIN q WHERE d.vec_id <> 0
    ),
    appr AS (
      SELECT vec_id FROM (
        SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cs FROM sa)
      ORDER BY cs DESC, vec_id LIMIT 10
    )
    SELECT count(*) / 10.0 AS recall_at_10 FROM truth JOIN appr USING (vec_id)
    """,
    doc=(
        "recall@10 of the SQ8 index vs full-precision brute force — the "
        "self-evaluation gate (sibling of sim_ivf_recall/sim_pq_recall)."
    ),
)
def sim_sq8_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import sq8_recall

    return sq8_recall(table(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


@register(
    "dedup_funnel",
    f"""
    WITH RECURSIVE surv AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
    ),
    sdocs AS (
      SELECT d.doc_id, d.text FROM documents d JOIN surv s ON d.doc_id = s.doc_id
    ),
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len({_WORDS}) - 2, 1) + 1),
        i -> array_to_string(({_WORDS})[i:i+2], ' ')))) AS shingle
      FROM sdocs
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
    ),
    labels AS (
      SELECT s AS doc_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s
    ),
    mm AS (
      SELECT CAST(count(*) AS BIGINT) AS members,
             CAST(count(DISTINCT cluster_id) AS BIGINT) AS comps
      FROM labels
    ),
    c AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_raw,
             (SELECT CAST(count(*) AS BIGINT) FROM surv) AS n_exact,
             members, comps
      FROM mm
    )
    SELECT stage_no, stage, n_docs, removed FROM (
      SELECT CAST(0 AS INT) AS stage_no, 'raw' AS stage,
             n_raw AS n_docs, CAST(0 AS BIGINT) AS removed FROM c
      UNION ALL
      SELECT CAST(1 AS INT), 'exact', n_exact, n_raw - n_exact FROM c
      UNION ALL
      SELECT CAST(2 AS INT), 'near_dup', n_exact - members + comps,
             members - comps FROM c
    ) ORDER BY stage_no
    """,
    doc=(
        "End-to-end dedup funnel with per-stage attrition: raw -> exact "
        "digest keep-min -> connected-component near-dup keep-one — the "
        "numbers a curation-pipeline owner watches per run."
    ),
)
def dedup_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import dedup_funnel

    return dedup_funnel(table(spark, sf_dir, "documents"), ngram=3, threshold=0.5)


def _logit_psi_oracle(iters: int = 12, lr: float = 4.0, n_bins: int = 10) -> str:
    """PSI oracle over the SAME unrolled training chain: score the
    reference and new snapshot slices with the trained stats+weights
    (the serving expression), fixed-decile bins on the 4dp score,
    Laplace-smoothed fractions, per-bin terms rounded 6dp, sum 4dp."""
    ctes, _ = _logit_train_ctes(iters, lr)
    z = (
        "(w0 + w1 * ((x1 - m1) / (CASE WHEN s1 = 0.0 THEN 1.0 ELSE s1 END))"
        " + w2 * ((x2 - m2) / (CASE WHEN s2 = 0.0 THEN 1.0 ELSE s2 END))"
        " + w3 * ((x3 - m3) / (CASE WHEN s3 = 0.0 THEN 1.0 ELSE s3 END)))"
    )
    p4 = f"round(1.0 / (1.0 + exp(-{z})), 4)"
    feat = """
      SELECT ln(CAST(len(w) AS DOUBLE)) AS x1,
             list_reduce(list_transform(w, x -> CAST(length(x) AS DOUBLE)),
               (a, b) -> a + b) / len(w) AS x2,
             CAST(len(list_filter(w, x -> {stop})) AS DOUBLE) / len(w) AS x3
      FROM (SELECT {words} AS w FROM {src}) WHERE len(w) >= 1
    """
    ref_src = "(SELECT text FROM documents WHERE doc_id % 10 <> 7)"
    new_src = (
        "(SELECT CASE WHEN doc_id % 13 = 0 THEN text || ' edited' ELSE text END AS text"
        " FROM documents WHERE doc_id % 10 <> 3)"
    )
    mk_feat = lambda src: feat.format(stop=_STOP_SQL, words=_WORDS, src=src)  # noqa: E731
    return f"""
    WITH {", ".join(ctes)},
    refb AS (
      SELECT CAST(least(floor({p4} * {n_bins}), {n_bins - 1}) AS INT) AS bin,
             count(*) AS n_ref
      FROM ({mk_feat(ref_src)}) f, stats, wt{iters} GROUP BY 1
    ),
    newb AS (
      SELECT CAST(least(floor({p4} * {n_bins}), {n_bins - 1}) AS INT) AS bin,
             count(*) AS n_new
      FROM ({mk_feat(new_src)}) f, stats, wt{iters} GROUP BY 1
    ),
    u AS (
      SELECT CAST(b.bin AS INT) AS bin,
             coalesce(refb.n_ref, 0) AS n_ref, coalesce(newb.n_new, 0) AS n_new
      FROM (SELECT unnest(range(0, {n_bins})) AS bin) b
      LEFT JOIN refb ON b.bin = refb.bin LEFT JOIN newb ON b.bin = newb.bin
    ),
    t AS (SELECT sum(n_ref) AS tr, sum(n_new) AS tn FROM u),
    terms AS (
      SELECT n_ref, n_new,
        round(((n_new + 0.5) / (tn + 0.5 * {n_bins}) - (n_ref + 0.5) / (tr + 0.5 * {n_bins}))
              * ln(((n_new + 0.5) / (tn + 0.5 * {n_bins}))
                   / ((n_ref + 0.5) / (tr + 0.5 * {n_bins}))), 6) AS term
      FROM u, t
    )
    SELECT CAST(sum(n_ref) AS BIGINT) AS n_ref, CAST(sum(n_new) AS BIGINT) AS n_new,
           round(sum(term), 4) AS psi
    FROM terms
    """


@register(
    "quality_score_psi",
    _logit_psi_oracle(12, 4.0),
    doc=(
        "Score-distribution drift monitor: Population Stability Index "
        "of the trained head's keep-probability between the reference "
        "snapshot slice and the new one (the corpus_snapshot_diff "
        "fixture), both scored by the SAME deployable model artifact. "
        "Fixed 4dp-exact decile bins, Laplace-smoothed fractions, "
        "per-bin terms rounded 6dp before the 4dp sum. psi < 0.1 "
        "stable, > 0.25 retrain — the number a corpus pipeline alarms "
        "on between releases. Two map-side scoring scans into <= 10 "
        "cells each; shares the session's one GD training via the "
        "_logit_train_frames memo."
    ),
)
def quality_score_psi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from yamon_spark.operators.curation import quality_head_fit, quality_score_psi

    docs = table(spark, sf_dir, "documents")
    model = quality_head_fit(docs, iters=12, lr=4.0)
    ref = docs.where(F.col("doc_id") % 10 != 7).select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 10 != 3).select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" edited")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return quality_score_psi(ref, new, model)


@register(
    "quality_drift_alarm",
    f"""
    WITH psi_t AS ({_logit_psi_oracle(12, 4.0)}),
    cal AS ({_logit_calibration_oracle(12, 4.0, 10)}),
    ece_t AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs,
             round(sum(n_docs * abs(mean_pred - frac_keep))
                   / CAST(sum(n_docs) AS DOUBLE), 4) AS ece
      FROM cal)
    SELECT n_ref, n_new, psi,
           CASE WHEN psi < 0.1 THEN 'stable'
                WHEN psi <= 0.25 THEN 'drifting'
                ELSE 'retrain' END AS psi_status,
           n_docs, ece,
           CAST(CASE WHEN psi > 0.25 OR ece > 0.1 THEN 1 ELSE 0 END AS INT)
             AS page
    FROM psi_t, ece_t
    """,
    doc=(
        "The operating table a quality-head owner pages on: ONE row "
        "composing the two drift monitors that already exist — the "
        "score-distribution PSI between the reference and new corpus "
        "slices (data drift: the inputs changed) and the head's "
        "expected calibration error (model drift: the probabilities "
        "stopped meaning what the threshold sweep assumed). PSI banded "
        "by the standard 0.1/0.25 rule, page = psi > 0.25 OR "
        "ece > 0.1. Both sides share the session's ONE GD training via "
        "the _logit_train_frames memo, so the composition adds a "
        "single 1-row x 1-row join over plans that already ran."
    ),
)
def quality_drift_alarm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    psi = quality_score_psi_q(spark, sf_dir)
    ece = quality_head_ece_q(spark, sf_dir).select("n_docs", "ece")
    psi_status = (
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") <= 0.25, "drifting")
        .otherwise("retrain")
    )
    page = ((F.col("psi") > 0.25) | (F.col("ece") > 0.1)).cast("int")
    return psi.crossJoin(ece).select(
        "n_ref",
        "n_new",
        "psi",
        psi_status.alias("psi_status"),
        "n_docs",
        "ece",
        page.alias("page"),
    )
