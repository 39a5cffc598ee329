"""Similarity search over embedding columns (`array<float>`).

- cosine_topk: brute-force exact top-k neighbors of a query vector.
  JVM-side `zip_with` + left-fold `aggregate` dot products (no Python in
  the loop); global top-k compiles to TakeOrderedAndProject. At 100 TB
  this is the exact-rerank baseline: one scan, no shuffle, k rows to the
  driver.
- ivf_topk: IVF-style ANN — restrict the scan to the query's coarse
  cell (here the precomputed `label` partition; at scale the cells come
  from KMeans centroids and the table is partitioned BY cell, so the
  probe prunes partitions instead of scanning 100 TB).
- Floating-point contract: elements are cast to double BEFORE any
  arithmetic and dot/norm folds are sequential left folds, so the DuckDB
  oracle (same fold order) produces bit-identical doubles; ordering uses
  the ROUNDED similarity with vec_id tiebreak for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns (double math)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    dot = _fold_sum(prod)
    na = _fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))
    nb = _fold_sum(F.transform(b, lambda x: x.cast("double") * x.cast("double")))
    return dot / (F.sqrt(na) * F.sqrt(nb))


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors of the row with vec_id=query_vec_id."""
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(F.col("embedding").alias("q_emb"))
    rest = embeddings.where(F.col("vec_id") != query_vec_id)
    sim = F.round(cosine_sim(F.col("embedding"), F.col("q_emb")), 4)
    return (
        rest.crossJoin(F.broadcast(q))
        .select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """IVF-bucketed ANN: search only the query's coarse cell (label).

    The scale path: cells = KMeans centroids (pyspark.ml KMeans fits on a
    sample; assignment is one broadcast-join pass), table partitioned by
    cell -> the probe reads 1/n_cells of the data. Here `label` is the
    precomputed cell id.
    """
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb"), F.col("label").alias("q_label")
    )
    rest = embeddings.where(F.col("vec_id") != query_vec_id)
    sim = F.round(cosine_sim(F.col("embedding"), F.col("q_emb")), 4)
    return (
        rest.crossJoin(F.broadcast(q))
        .where(F.col("label") == F.col("q_label"))
        .select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via coarse-cell blocking:
    only pairs within the same cell are compared (LSH/IVF blocking), then
    exact cosine filters at `threshold`. Avoids the O(N²) cross join."""
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    sim = F.round(cosine_sim(F.col("a.embedding"), F.col("b.embedding")), 4)
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )
