"""Scans / projection / filter / distinct / sort / set ops (Q01-Q03, Q40-Q43).

Spark-first notes: all predicates here are plain column comparisons, so
Catalyst pushes them into the parquet scan (PushedFilters) and prunes
columns (ReadSchema) — at 100 TB the scan reads only the referenced
columns' pages and skips row groups via min/max stats. Q40's global top-k
compiles to TakeOrderedAndProject (per-partition heap + driver merge of k
rows), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yamon_spark.queries import register, table


@register(
    "q01_filter_project",
    """
    SELECT event_id, event_type, round(value, 4) AS value
    FROM events WHERE event_type = 'error' AND value > 50
    ORDER BY event_id
    """,
    doc="Filter + projection over the events stream (tag/level-filter analogue).",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.where((F.col("event_type") == "error") & (F.col("value") > 50))
        .select("event_id", "event_type", F.round("value", 4).alias("value"))
        .orderBy("event_id")
    )


@register(
    "q02_pushdown_predicates",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="TPC-H Q6-shaped conjunctive predicates — all pushed to the parquet scan.",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q03_distinct",
    "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    doc="Distinct over a low-cardinality column (partial hash-agg map-side).",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select("event_type").distinct().orderBy("event_type")


@register(
    "q40_global_topk",
    """
    SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Global top-k -> TakeOrderedAndProject (no full sort at scale).",
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice"))
    )


@register(
    "q41_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION SELECT s_nationkey FROM supplier ORDER BY nationkey
    """,
    doc="UNION DISTINCT of two filtered scans: union + hash-distinct with partial aggregation before the shuffle.",
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


@register(
    "q42_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey
    """,
    doc="INTERSECT compiled to a left-semi hash join over distinct rows.",
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@register(
    "q43_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey
    """,
    doc="EXCEPT compiled to a left-anti hash join over distinct rows.",
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")  # subtract == EXCEPT DISTINCT
