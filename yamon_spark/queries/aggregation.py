"""Aggregation (Q20-Q26): hash agg, distinct agg, approx distinct,
grouping sets, rollup, and the reference's two materialized-view rollups.

Q25/Q26 are the ONLY aggregations the reference itself defines — the
ClickHouse materialized views metrics_gauge_lts_mv (avg per 1-minute
bucket, reference res/schema.sql:39-50) and metrics_counter_lts_mv (sum,
res/schema.sql:71-82) — re-expressed as tumbling event-time windows.
Everything else is the surface those tables exist to serve.

Scale: groupBy aggs all run partial (map-side combine) + final automatically;
approx_count_distinct is the HLL++ sketch (constant memory per group vs
countDistinct's shuffle-the-keys expand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yamon_spark.queries import register, table


@register(
    "q20_hash_agg",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS cnt
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: multi-aggregate hash aggregation.",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q21_distinct_agg",
    """
    SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="COUNT(DISTINCT) per group: two-phase expand + partial hash aggregation.",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
        .orderBy("o_orderstatus")
    )


@register(
    "q22_approx_distinct",
    "SELECT TRUE AS within_tolerance",
    doc="HLL++ approx_count_distinct within ±5% of exact (tolerance boolean).",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    return agg.select(
        (
            (F.col("approx") >= F.col("exact") * 0.95) & (F.col("approx") <= F.col("exact") * 1.05)
        ).alias("within_tolerance")
    )


@register(
    "q23_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, cnt
    """,
    doc="GROUPING SETS over order status/priority: one Expand node feeding a single hash aggregate, not one scan per set.",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("_q23_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM _q23_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, cnt
        """
    )


@register(
    "q24_rollup",
    """
    SELECT n_name, o_orderstatus, round(sum(o_totalprice), 4) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, o_orderstatus)
    ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST, sum_price
    """,
    doc="ROLLUP over nation x order status with two broadcast dim joins; subtotal rows from the same single-scan Expand.",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        joined.rollup("n_name", "o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("sum_price"))
        .orderBy(F.col("n_name").asc_nulls_first(), F.col("o_orderstatus").asc_nulls_first(), "sum_price")
    )


@register(
    "q25_gauge_rollup_mv",
    """
    SELECT date_trunc('minute', ts) AS w, user_id, round(avg(value), 4) AS avg_value
    FROM events WHERE event_type = 'view'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc=(
        "The reference's gauge MV (res/schema.sql:39-50): tumbling 1-minute "
        "AVG grouped by the dimension set — 'view' events play gauges."
    ),
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "view")
        .groupBy(F.window("ts", "1 minute").alias("win"), "user_id")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("win.start").alias("w"), "user_id", "avg_value")
        .orderBy("w", "user_id")
    )


@register(
    "q26_counter_rollup_mv",
    """
    SELECT date_trunc('minute', ts) AS w, user_id, round(sum(value), 4) AS sum_value
    FROM events WHERE event_type = 'click'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="The reference's counter MV (res/schema.sql:71-82): tumbling SUM.",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.window("ts", "1 minute").alias("win"), "user_id")
        .agg(F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("w"), "user_id", "sum_value")
        .orderBy("w", "user_id")
    )
