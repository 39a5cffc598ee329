"""Model/data-quality EVAL queries: the measurement layer a curation
pipeline runs on its own classifiers and embeddings.

- lang_id_confusion: confusion matrix of the marker-word language-ID
  heuristic against the labeled `lang` column — the eval every
  classifier-gated filter needs before its verdicts drive dropping.
- embed_label_metrics: per-label embedding cohesion — average cosine of
  each vector to its own label centroid vs to the global centroid. The
  gap (cohesion) is the one-number health check that label structure
  actually exists in the embedding space (it gates semantic dedup and
  IVF cell quality).

Determinism: centroids are per-dim round(avg, 4) (the embed_centroids
contract — identical on both engines); per-vector cosines round to 4dp
and then quantize to exact 1e-4 integer units, so the per-label sums
are exact integers and the emitted averages are single int/int IEEE
divisions (FIXTURES.md integer-cents rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yamon_spark.queries import register, table
from yamon_spark.queries.pipeline_ops import _WORDS, lang_id_sql_parts

# counts + tie-break CASE generated from operators.text.LANG_MARKERS —
# the same fragment text_lang_id's oracle uses, so the confusion matrix
# can never drift from the classifier it evaluates
_LANG_COUNTS, _, _LANG_CASE = lang_id_sql_parts()


@register(
    "lang_id_confusion",
    f"""
    WITH t AS (SELECT doc_id, lang, {_WORDS} AS w FROM documents),
    c AS (
      SELECT doc_id, lang,
        {_LANG_COUNTS}
      FROM t
    ),
    p AS (
      SELECT lang,
        {_LANG_CASE} AS pred_lang
      FROM c
    )
    SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END AS INT) AS correct
    FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang
    """,
    doc=(
        "Language-ID confusion matrix: heuristic prediction vs labeled "
        "lang, one partial-agg groupBy over |langs|² cells — the eval "
        "gate a classifier-driven filter ships with."
    ),
)
def lang_id_confusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import lang_id

    pred = lang_id(table(spark, sf_dir, "documents")).select("lang", "pred_lang")
    return (
        pred.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(
            "lang",
            "pred_lang",
            "n_docs",
            F.when(F.col("lang") == F.col("pred_lang"), 1).otherwise(0).cast("int").alias("correct"),
        )
        .orderBy("lang", "pred_lang")
    )


_CENT_COS = """
      list_reduce(list_transform(range(1, 65),
        i -> CAST(e.embedding[i] AS DOUBLE) * {cent}[i]), (a, b) -> a + b)
      / (sqrt(list_reduce(list_transform(e.embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
         * sqrt(list_reduce(list_transform({cent},
             x -> x * x), (a, b) -> a + b)))
"""


@register(
    "embed_label_metrics",
    f"""
    WITH cd AS (
      SELECT label, CAST(d - 1 AS INT) AS dim,
             round(avg(CAST(embedding[d] AS DOUBLE)), 4) AS c
      FROM embeddings, range(1, 65) t(d) GROUP BY label, dim
    ),
    cent AS (SELECT label, list(c ORDER BY dim) AS cent FROM cd GROUP BY label),
    gd AS (
      SELECT CAST(d - 1 AS INT) AS dim,
             round(avg(CAST(embedding[d] AS DOUBLE)), 4) AS c
      FROM embeddings, range(1, 65) t(d) GROUP BY dim
    ),
    g AS (SELECT list(c ORDER BY dim) AS gcent FROM gd),
    s AS (
      SELECT e.label,
             {_CENT_COS.format(cent="cent.cent")} AS ic,
             {_CENT_COS.format(cent="g.gcent")} AS gc
      FROM embeddings e JOIN cent USING (label) CROSS JOIN g
      WHERE list_reduce(list_transform(e.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) <> 0
    ),
    q AS (
      SELECT label,
             CAST(floor(round(ic, 4) * 10000 + 0.5) AS BIGINT) AS icq,
             CAST(floor(round(gc, 4) * 10000 + 0.5) AS BIGINT) AS gcq
      FROM s
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           sum(icq) / (10000.0 * count(*)) AS avg_intra_cos,
           sum(gcq) / (10000.0 * count(*)) AS avg_global_cos,
           sum(icq) / (10000.0 * count(*)) - sum(gcq) / (10000.0 * count(*)) AS cohesion
    FROM q GROUP BY label ORDER BY label
    """,
    doc=(
        "Embedding-space label cohesion: avg cosine to own-label centroid "
        "vs to the global centroid, per label — the health check that "
        "label structure exists (gates semantic dedup / IVF cells). One "
        "posexplode agg to |labels|×dim cells + a broadcast centroid join; "
        "per-label sums are exact 1e-4-unit integers."
    ),
)
def embed_label_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import label_separation

    return label_separation(table(spark, sf_dir, "embeddings"))


@register(
    "embed_outlier_score",
    """
    WITH cd AS (
      SELECT label, CAST(d - 1 AS INT) AS dim,
             round(avg(CAST(embedding[d] AS DOUBLE)), 4) AS c
      FROM embeddings, range(1, 65) t(d) GROUP BY label, dim
    ),
    cent AS (SELECT label, list(c ORDER BY dim) AS carr FROM cd GROUP BY label),
    s AS (
      SELECT e.vec_id, e.label,
             round(list_reduce(list_transform(range(1, 65),
               k -> (CAST(e.embedding[k] AS DOUBLE) - cent.carr[k])
                    * (CAST(e.embedding[k] AS DOUBLE) - cent.carr[k])),
               (a, b) -> a + b), 4) AS dist
      FROM embeddings e JOIN cent USING (label)
    ),
    st AS (
      SELECT label, round(avg(dist), 4) AS m, round(stddev_pop(dist), 4) AS sd
      FROM s GROUP BY label
    ),
    zed AS (
      SELECT vec_id, s.label, dist,
             round((dist - m) / (CASE WHEN sd = 0.0 THEN 1.0 ELSE sd END), 4) AS z_dist
      FROM s JOIN st ON s.label = st.label
    )
    SELECT vec_id, label, dist, z_dist,
           CAST(abs(z_dist) > 2.0 AS INT) AS is_outlier
    FROM zed ORDER BY vec_id
    """,
    doc=(
        "Embedding-space label-noise gate: per vector, the z-scored "
        "squared L2 distance to its OWN label centroid; |z| > 2 flags "
        "vectors whose embedding disagrees with their label — the eval "
        "that justifies re-labeling/dropping before labels drive IVF "
        "cells or semantic-dedup anchors. Two bounded broadcast "
        "aggregates (|labels|xdim centroids, |labels|-row stats); "
        "distance and z are map-side. 4dp rounding before every "
        "cross-engine comparison point."
    ),
)
def embed_outlier_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import embed_outlier_score

    return embed_outlier_score(table(spark, sf_dir, "embeddings"), z_threshold=2.0)
