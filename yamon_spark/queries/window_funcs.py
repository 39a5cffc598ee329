"""Window functions (Q30-Q33): ranking, lag/delta, frames, cumulative.

Q31 is the load-bearing one for the reference: counter metrics
(common/metric.go:9-14) are monotone totals, and every rate() query is
`value - lag(value)` per series ordered by time — exactly the per-key
window below. At scale each window is one shuffle by the partition key;
the per-user (per-series) ordering is a within-partition sort that AQE
sizes, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yamon_spark.queries import register, table


@register(
    "q30_topk_per_group",
    """
    SELECT o_orderstatus, rn, o_orderkey, round(o_totalprice, 4) AS o_totalprice FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3 ORDER BY o_orderstatus, rn
    """,
    doc="Top-3 per group via row_number (deterministic tiebreak on key).",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderstatus", "rn", "o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice"))
        .orderBy("o_orderstatus", "rn")
    )


@register(
    "q31_counter_delta",
    """
    SELECT event_id, user_id,
           round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
    FROM events ORDER BY user_id, event_id
    """,
    doc="rate()/counter-delta numerator: value - lag(value) per series.",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q32_moving_avg",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 4) AS mavg
    FROM events ORDER BY user_id, event_id
    """,
    doc="5-row centered moving average (explicit frame spec).",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 2)
    return (
        ev.select("event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("mavg"))
        .orderBy("user_id", "event_id")
    )


@register(
    "q33_running_sum",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS rsum
    FROM events ORDER BY user_id, event_id
    """,
    doc="Cumulative sum per series.",
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.select("event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("rsum"))
        .orderBy("user_id", "event_id")
    )
