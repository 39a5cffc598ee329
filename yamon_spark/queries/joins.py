"""Joins (Q10-Q16): inner/outer/semi/anti/range/as-of/cross.

Scale notes:
- Dimension tables (region/nation, and customer vs orders at ratio 1:10)
  are broadcast — no shuffle of the fact side. `F.broadcast` hints it
  explicitly where the dim is guaranteed tiny; AQE would also demote/
  promote at runtime from observed sizes.
- Q14's range join keeps the equi-key (l_orderkey) as the join key so it
  executes as a shuffled/broadcast HASH join with a residual range filter,
  NOT a cartesian BNL join.
- Q15's as-of join is the union + last(ignorenulls) window formulation:
  one shuffle by user_id, linear scan per partition — the scalable as-of
  plan (a join+groupBy(max) formulation would shuffle twice and blow up on
  dense histories).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yamon_spark.queries import register, table


@register(
    "q10_inner_join_dims",
    """
    SELECT c_custkey, n_name, r_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' ORDER BY c_custkey
    """,
    doc="Star-schema dim join; both dims broadcast (zero fact shuffle).",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
        .orderBy("c_custkey")
    )


@register(
    "q11_left_outer_count",
    """
    SELECT c_custkey, count(o_orderkey) AS order_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
    doc="Left outer join preserving zero-order customers.",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
        .orderBy("c_custkey")
    )


@register(
    "q12_semi_join",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    ORDER BY c_custkey
    """,
    doc="Left semi join — existence check, no row multiplication.",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey").orderBy("c_custkey")


@register(
    "q13_anti_join",
    """
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left anti join — customers with no orders.",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey").orderBy("c_custkey")


@register(
    "q14_range_join",
    """
    SELECT o_orderkey, count(l_orderkey) AS n_shipped_30d
    FROM orders LEFT JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderkey ORDER BY o_orderkey
    """,
    doc="Equi-key + residual range predicate -> hash join, not BNL.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAY"))
    )
    return (
        o.join(li, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_shipped_30d"))
        .orderBy("o_orderkey")
    )


@register(
    "q15_asof_join",
    """
    WITH u AS (
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_type = 'purchase' THEN event_id END AS dep_id
      FROM events WHERE event_type IN ('error', 'purchase')
    ), w AS (
      SELECT event_id, user_id, event_type,
             last_value(dep_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_event_id
      FROM u
    )
    SELECT event_id, user_id, asof_event_id FROM w
    WHERE event_type = 'error' ORDER BY event_id
    """,
    doc=(
        "As-of join: for each 'error' event, the latest prior 'purchase' "
        "for the same user (the query the counter/rate schema exists for). "
        "Union + last(ignorenulls) window: single shuffle by user_id."
    ),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.asof import asof_join_events

    ev = table(spark, sf_dir, "events")
    return asof_join_events(ev, left_type="error", right_type="purchase")


@register(
    "q16_cross_join_pairs",
    """
    SELECT a.r_name AS a_name, b.r_name AS b_name
    FROM region a CROSS JOIN region b WHERE a.r_name < b.r_name
    ORDER BY a_name, b_name
    """,
    doc="Tiny cross join (both sides broadcastable).",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("a_name"))
    b = r.select(F.col("r_name").alias("b_name"))
    return a.crossJoin(F.broadcast(b)).where(F.col("a_name") < F.col("b_name")).orderBy("a_name", "b_name")
