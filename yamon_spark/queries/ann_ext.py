"""Declared queries for product-quantization ANN (SURVEY §2.7 extension):
pq_codes (corpus compression) and pq_topk (asymmetric-distance search).

The md5-derived codebook is embedded in BOTH the Spark plan and the
generated DuckDB oracle as literals (same trick as the LSH hyperplanes
and minhash coefficients), so code assignment and distances reproduce
bit-for-bit: every squared-difference fold walks the same element order
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from yamon_spark.operators.similarity import pq_codebook
from yamon_spark.queries import register, table

_M, _K, _SUB = 8, 16, 8
_CB = pq_codebook(_M, _K, _SUB)


def _cb_sql(j: int) -> str:
    return (
        "[" + ", ".join("[" + ", ".join(f"{x:g}" for x in c) + "]" for c in _CB[j]) + "]::DOUBLE[][]"
    )


def _dists_sql(j: int) -> str:
    """Distances from subvector j to all centroids of codebook j."""
    term = f"(c[i] - CAST(embedding[{j * _SUB} + i] AS DOUBLE))"
    return (
        f"list_transform({_cb_sql(j)}, c -> list_reduce(list_transform("
        f"range(1, {_SUB + 1}), i -> {term} * {term}), (a, b) -> a + b))"
    )


_CODES_CTE = (
    "WITH d AS (SELECT vec_id, "
    + ", ".join(f"{_dists_sql(j)} AS d{j}" for j in range(_M))
    + " FROM embeddings), codes AS (SELECT vec_id, "
    + ", ".join(f"CAST(list_position(d{j}, list_min(d{j})) - 1 AS INT) AS c{j}" for j in range(_M))
    + " FROM d)"
)


@register(
    "pq_codes",
    _CODES_CTE + " SELECT * FROM codes ORDER BY vec_id",
    doc=(
        "Product-quantization encoding: m=8 subspaces x 16 centroids -> "
        "8 small ints per vector (the compressed-index scale path)."
    ),
)
def pq_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import pq_encode

    return pq_encode(table(spark, sf_dir, "embeddings"), m=_M, k=_K, sub_dim=_SUB)


def _pq_dist_sql() -> str:
    parts = []
    for j in range(_M):
        cent = f"(({_cb_sql(j)})[c{j} + 1])"
        term = f"({cent}[i] - CAST(q.q_emb[{j * _SUB} + i] AS DOUBLE))"
        parts.append(
            f"list_reduce(list_transform(range(1, {_SUB + 1}), i -> {term} * {term}), (a, b) -> a + b)"
        )
    return " + ".join(parts)


@register(
    "pq_topk",
    _CODES_CTE
    + f"""
    , q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round({_pq_dist_sql()}, 4) AS pq_dist
    FROM codes CROSS JOIN q WHERE vec_id <> 0
    ORDER BY pq_dist, vec_id LIMIT 10
    """,
    doc=(
        "PQ asymmetric-distance top-10: uncompressed query vs coded "
        "corpus — sum of per-subspace distances to the selected centroid."
    ),
)
def pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.similarity import pq_topk

    return pq_topk(table(spark, sf_dir, "embeddings"), query_vec_id=0, topk=10, m=_M, k=_K, sub_dim=_SUB)
