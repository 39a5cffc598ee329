"""Corpus-health and tuning REPORT queries (r10): the operating tables
a 100 TB training-data pipeline reads before committing thresholds —
which quality rule cuts what, what a context-length cut discards, how
duplicated the crawl is, which LSH banding to run, whether the
embedding space and its label cells are healthy.

All six are single-digit-row reports produced by one or two partial-agg
scans (the threshold-sweep plan family): conditional sums into a
stacked report, never per-config rescans of the corpus. Determinism
follows the house rules — per-cell rounding before any cross-partition
sum crosses an engine boundary (FIXTURES.md).

Reference parity: the reference (b1naryth1ef/yamon) is a metrics agent
with no corpus tooling; these are part of the training-data surface
SURVEY §2.7 adds on top of its operator inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from yamon_spark.queries import register, table
from yamon_spark.queries.pipeline_ops import _WORDS, _shingle_cte

_STOP_IN = "('the', 'a', 'of', 'and', 'in')"


def _gopher_oracle() -> str:
    from yamon_spark.operators.curation import GOPHER_RULES

    preds = [
        "n_words < 10 OR n_words > 1000",
        "awl < 2.0 OR awl > 12.0",
        "stop_hits < 2",
        "alpha_ratio < 0.8",
        "max_wl > 15",
    ]
    sums = ", ".join(
        f"sum(CASE WHEN {p} THEN 1 ELSE 0 END) AS n{i}" for i, p in enumerate(preds)
    )
    unpivot = " UNION ALL ".join(
        f"SELECT '{name}' AS rule, n{i} AS n_fail, n_docs FROM agg"
        for i, name in enumerate(GOPHER_RULES)
    )
    return rf"""
    WITH t AS (SELECT doc_id, text, {_WORDS} AS w FROM documents),
    f AS (
      SELECT
        CAST(len(w) AS DOUBLE) AS n_words,
        list_reduce(list_transform(w, x -> CAST(length(x) AS DOUBLE)), (a, b) -> a + b)
          / CAST(len(w) AS DOUBLE) AS awl,
        len(list_filter(w, x -> x IN {_STOP_IN})) AS stop_hits,
        CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
          / greatest(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE), 1.0)
          AS alpha_ratio,
        list_max(list_transform(w, x -> length(x))) AS max_wl
      FROM t
    ),
    agg AS (SELECT count(*) AS n_docs, {sums} FROM f)
    SELECT rule, CAST(n_fail AS BIGINT) AS n_fail,
           round(CAST(n_fail AS DOUBLE) / n_docs, 4) AS fail_frac
    FROM ({unpivot}) ORDER BY rule
    """


@register(
    "quality_gopher_rules",
    _gopher_oracle(),
    doc=(
        "Per-rule Gopher-style corpus failure report (word-count band, "
        "mean-word-length band, min stopword hits, alpha-char ratio, "
        "max word length): n_fail + fail_frac per rule from ONE "
        "conditional-sum scan — which rule would cut how much of the "
        "crawl, read before committing quality thresholds."
    ),
)
def gopher_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.curation import quality_gopher_rules

    return quality_gopher_rules(table(spark, sf_dir, "documents"))


_CUTS = (64, 128, 256, 512, 1024, 2048, 4096)


@register(
    "doc_length_survival",
    f"""
    WITH n AS (SELECT len({_WORDS}) AS n FROM documents),
    tot AS (SELECT count(*) AS n_docs, sum(n) AS n_tokens FROM n),
    c AS (SELECT unnest([{", ".join(str(c) for c in _CUTS)}]) AS cut),
    a AS (
      SELECT cut,
        sum(CASE WHEN n > cut THEN 1 ELSE 0 END) AS n_trunc,
        sum(CASE WHEN n > cut THEN n - cut ELSE 0 END) AS lost
      FROM n, c GROUP BY cut
    )
    SELECT CAST(cut AS BIGINT) AS cut,
           CAST(n_trunc AS BIGINT) AS n_docs_truncated,
           round(CAST(n_trunc AS DOUBLE) / t.n_docs, 4) AS frac_docs_truncated,
           CAST(lost AS BIGINT) AS tokens_lost,
           round(CAST(lost AS DOUBLE) / t.n_tokens, 4) AS frac_tokens_lost
    FROM a, tot t ORDER BY cut
    """,
    doc=(
        "Context-length operating table: per candidate max_seq_len cut "
        "(64..4096), docs clipped and corpus token fraction discarded — "
        "ONE conditional-sum scan stacked to 7 rows, the table read "
        "before committing a sequence length to a training run."
    ),
)
def doc_length_survival_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import doc_length_survival

    return doc_length_survival(table(spark, sf_dir, "documents"), cuts=_CUTS)


@register(
    "embed_intrinsic_dim",
    """
    WITH e AS (
      SELECT CAST(d - 1 AS INT) AS dim, CAST(embedding[d] AS DOUBLE) AS v
      FROM embeddings, range(1, 65) t(d)
    ),
    p AS (SELECT dim, round(var_pop(v), 6) AS vv FROM e GROUP BY dim)
    SELECT CAST(count(*) AS INT) AS n_dims,
           round(sum(vv) * sum(vv) / sum(vv * vv), 2) AS participation_ratio,
           round(max(vv) / sum(vv), 4) AS top_dim_share,
           round(sum(vv), 4) AS total_var
    FROM p
    """,
    doc=(
        "Participation-ratio intrinsic dimensionality of the embedding "
        "space ((sum var)^2 / sum var^2 over per-dim variances) plus "
        "top-dimension variance share — the one-row 'did the encoder "
        "collapse' check run before building any ANN index."
    ),
)
def intrinsic_dim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import embedding_intrinsic_dim

    return embedding_intrinsic_dim(table(spark, sf_dir, "embeddings"))


@register(
    "dedup_cluster_sizes",
    """
    WITH corpus AS (
      SELECT text FROM documents
      UNION ALL SELECT text FROM documents WHERE doc_id % 7 = 0
      UNION ALL SELECT text FROM documents WHERE doc_id % 21 = 0
    ),
    s AS (SELECT md5(text) AS digest, count(*) AS cluster_size FROM corpus GROUP BY 1)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM s GROUP BY cluster_size ORDER BY cluster_size
    """,
    doc=(
        "Duplicate-cluster size histogram from exact content-digest "
        "dedup — clusters and docs per observed size; two map-side-"
        "combined groupBys, the 'how duplicated is this crawl' headline. "
        "The fixture corpus is dup-free, so the wrapper re-dups every "
        "7th doc (and every 21st twice) for real size-1/2/3 tiers — the "
        "corpus_snapshot_diff synthetic-derivation precedent."
    ),
)
def cluster_sizes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from yamon_spark.operators.dedup import dedup_cluster_sizes

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = (
        docs.select("text")
        .unionAll(docs.where(F.col("doc_id") % 7 == 0).select("text"))
        .unionAll(docs.where(F.col("doc_id") % 21 == 0).select("text"))
    )
    return dedup_cluster_sizes(corpus)


@register(
    "sim_centroid_margin",
    """
    WITH ev AS (
      SELECT vec_id, label, CAST(d - 1 AS INT) AS dim, CAST(embedding[d] AS DOUBLE) AS v
      FROM embeddings, range(1, 65) t(d)
    ),
    c AS (SELECT label AS clabel, dim, round(avg(v), 4) AS c FROM ev GROUP BY 1, 2),
    d AS (
      SELECT e.vec_id, e.label, c.clabel,
             round(sum((e.v - c.c) * (e.v - c.c)), 6) AS dist
      FROM ev e JOIN c ON e.dim = c.dim GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT vec_id, label, clabel, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rn
      FROM d
    ),
    m AS (
      SELECT r1.vec_id, r1.label, r1.clabel AS nearest_label,
             round(sqrt(r2.dist) - sqrt(r1.dist), 4) AS margin
      FROM r r1 JOIN r r2 ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN nearest_label <> label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_misassigned,
           round(avg(margin), 4) AS avg_margin
    FROM m GROUP BY label ORDER BY label
    """,
    doc=(
        "Per-label assignment-confidence report against label centroids: "
        "margin = sqrt(d2) - sqrt(d1) between nearest and second-nearest "
        "centroid per vector, plus misassignment counts — the number "
        "that sizes IVF n_probe before recall sags in production."
    ),
)
def centroid_margin_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import centroid_margin_report

    return centroid_margin_report(table(spark, sf_dir, "embeddings"))


def _band_tuning_oracle(num_hashes: int = 12, band_sizes: tuple[int, ...] = (2, 3, 4, 6)) -> str:
    from yamon_spark.operators.dedup import MINHASH_P, minhash_coeffs

    sigs = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    selects = []
    for r in band_sizes:
        for b in range(num_hashes // r):
            key = " || '|' || ".join(f"CAST(sig_{b * r + j} AS VARCHAR)" for j in range(r))
            selects.append(f"SELECT {r} AS band_size, {b} AS band, md5({key}) AS band_key FROM sigt")
    union = " UNION ALL ".join(selects)
    thr_case = " ".join(
        f"WHEN band_size = {r} THEN {round((1.0 / (num_hashes // r)) ** (1.0 / r), 4)}"
        for r in band_sizes
    )
    return f"""
    WITH {_shingle_cte(3)}
    , hashed AS (
      SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) % {MINHASH_P} AS h
      FROM sh
    )
    , sigt AS (SELECT doc_id, {sigs} FROM hashed GROUP BY doc_id)
    , allb AS ({union})
    , buckets AS (SELECT band_size, band, band_key, count(*) AS n FROM allb GROUP BY 1, 2, 3)
    SELECT CAST({num_hashes} / band_size AS INT) AS n_bands,
           CAST(band_size AS INT) AS band_size,
           CAST(CASE {thr_case} END AS DOUBLE) AS est_threshold,
           CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS buckets_ge2,
           CAST(sum(n * (n - 1) / 2) AS BIGINT) AS candidate_checks
    FROM buckets GROUP BY band_size ORDER BY band_size
    """


@register(
    "dedup_lsh_band_tuning",
    _band_tuning_oracle(),
    doc=(
        "LSH banding operating-point table: ONE 12-seed MinHash "
        "signature pass; every (bands, rows) split's measured bucket "
        "collisions and implied candidate checks next to the analytic "
        "S-curve threshold (1/b)^(1/r) — all configs' band keys emit "
        "from one projection into one groupBy (one scan, one shuffle), "
        "the table read before committing a banding to a 100 TB dedup."
    ),
)
def band_tuning_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.dedup import lsh_band_tuning

    return lsh_band_tuning(table(spark, sf_dir, "documents"))
