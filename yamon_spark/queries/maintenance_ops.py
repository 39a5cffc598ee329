"""Declared queries for round-8 index-maintenance operators: the
SQL-expressible twins of the IVF upkeep path (ivf_append / ivf_recall).

A 100 TB ANN index is never rebuilt per batch — new vectors are assigned
to existing cells (broadcast-centroid argmin, cost independent of index
size) and a recall gate decides when quantizer drift warrants a rebuild.
`embedding_assign_delta` is that assignment step under the driver oracle.

Determinism contract (FIXTURES.md): squared distances round to 4dp BEFORE
the argmin so cross-engine last-ulp noise cannot flip a tie; ties break on
lowest cell id; total ORDER BY vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from yamon_spark.queries import register, table

_DIM = 64  # testdata embeddings are FLOAT[64] (TESTDATA.md)


@register(
    "embedding_assign_delta",
    f"""
    WITH emb AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             (vec_id % 10) = 7 AS d
      FROM embeddings
    ),
    cells AS (
      SELECT label AS cell, CAST(k AS INT) AS dim, round(avg(e[k]), 4) AS cv
      FROM emb, range(1, {_DIM + 1}) t(k)
      WHERE NOT d
      GROUP BY 1, 2
    ),
    carr AS (
      SELECT cell, list(cv ORDER BY dim) AS carr FROM cells GROUP BY cell
    ),
    dists AS (
      SELECT m.vec_id, c.cell, m.label,
             round(list_reduce(list_transform(range(1, {_DIM + 1}),
               k -> (m.e[k] - c.carr[k]) * (m.e[k] - c.carr[k])),
               (a, b) -> a + b), 4) AS sq_dist
      FROM emb m, carr c WHERE m.d
    ),
    best AS (
      SELECT vec_id, cell, sq_dist, label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sq_dist, cell) AS rn
      FROM dists
    )
    SELECT vec_id, CAST(cell AS INT) AS assigned_cell, sq_dist,
           CAST(cell = label AS INT) AS label_hit
    FROM best WHERE rn = 1 ORDER BY vec_id
    """,
    doc=(
        "Incremental IVF cell assignment (ivf_append's core step under "
        "the oracle): vectors with vec_id % 10 == 7 are the arriving "
        "delta batch, per-label centroids come from the index side only "
        "(4dp-rounded), each delta vector goes to its nearest centroid "
        "(squared L2, rounded before the argmin, ties -> lowest cell). "
        "label_hit is the drift signal: a batch whose hit-rate sags is "
        "a quantizer-rebuild trigger. Per-batch cost = batch x |cells| "
        "broadcast compares, independent of index size."
    ),
)
def embedding_assign_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import embedding_assign_delta

    return embedding_assign_delta(table(spark, sf_dir, "embeddings"), batch_mod=10, batch_rem=7)
