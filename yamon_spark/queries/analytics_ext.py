"""Extended analytics surface: pivot, percentiles, heavy hitters, rate,
gap-fill, distribution windows, histogram, subqueries, log search.

These widen SURVEY §2.5 with the query shapes a monitoring store answers
daily — ClickHouse idioms re-expressed Spark-first:

- q34 is the full ``rate()`` (per-second) completion of Q31's delta —
  the reason the counter metric type exists (reference
  common/metric.go:9-14, rollup MV res/schema.sql:71-82).
- q35 mirrors ClickHouse ``ORDER BY ... WITH FILL STEP`` (dashboards
  need dense time axes; missing buckets become zeros). Spark-first:
  per-key ``sequence()`` + explode generates the dense grid
  distributed by key — no driver-side loop, no cross join.
- text_search is the log-search shape the logs table's ORDER BY
  (service,host,ts) + bloom indexes exist for (res/schema.sql:93-98).

Scale notes: every query here is a single shuffle (one groupBy or one
window) except q35 (grid join — broadcast-able bounds side) and the
subqueries (scalar agg broadcast). Pivot compiles to a single hash agg
with conditional counters — same plan as the FILTER oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yamon_spark.queries import register, table


@register(
    "q34_counter_rate",
    """
    SELECT user_id, event_id,
           round((value - lag(value)  OVER w)
                 / (nullif(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) / 1000000.0),
                 4) + 0.0 AS rate
    FROM events WHERE event_type = 'click'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    doc="Full per-second rate() over counters: delta(value)/delta(seconds) "
    "per series — Q31's numerator completed (common/metric.go:9-14).",
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    dv = F.col("value") - F.lag("value").over(w)
    dt = F.nullif(us - F.lag(us).over(w), F.lit(0)) / F.lit(1000000.0)
    return (
        # "+ 0.0" collapses IEEE signed zero (-0.0 + 0.0 = +0.0) on both
        # sides: an unchanged counter yields -0.0 in Spark vs +0.0 in some
        # engines, which breaks byte-level value hashing despite equality.
        ev.select("user_id", "event_id", (F.round(dv / dt, 4) + F.lit(0.0)).alias("rate"))
        .orderBy("user_id", "event_id")
    )


@register(
    "q27_pivot",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Pivot order counts by status; single hash agg, no extra shuffle.",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
        .select(
            "o_orderpriority",
            F.col("F").alias("cnt_f"),
            F.col("O").alias("cnt_o"),
            F.col("P").alias("cnt_p"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q28_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (Spark percentile == "
    "SQL percentile_cont == DuckDB quantile_cont).",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # one array-form percentile call: a single sort buffer per group
    # serves all four quantiles (4 separate percentile() aggs each keep
    # and merge their own value buffer — measured ~4x slower at sf0.1)
    ps = F.expr("percentile(l_extendedprice, array(0.25D, 0.50D, 0.90D, 0.99D))")
    agg = li.groupBy("l_returnflag").agg(ps.alias("ps"))
    return agg.select(
        "l_returnflag",
        *[F.round(F.element_at("ps", i + 1), 4).alias(a) for i, a in enumerate(["p25", "p50", "p90", "p99"])],
    ).orderBy("l_returnflag")


@register(
    "q29_heavy_hitters",
    """
    SELECT p_brand, count(*) AS cnt FROM part
    GROUP BY p_brand ORDER BY cnt DESC, p_brand LIMIT 10
    """,
    doc="Heavy hitters: top-10 most frequent brands (partial agg + "
    "TakeOrderedAndProject — no global sort materialized).",
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "p_brand")
        .limit(10)
    )


@register(
    "q35_gap_fill",
    """
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS w, count(*) AS cnt,
             sum(value) AS sv
      FROM events WHERE event_type = 'purchase' AND user_id < 8
      GROUP BY 1, 2),
    r AS (SELECT user_id, min(w) AS lo, max(w) AS hi FROM b GROUP BY 1),
    g AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS w
          FROM r)
    SELECT g.user_id, g.w, coalesce(b.cnt, 0) AS cnt,
           round(coalesce(b.sv, 0), 4) AS sv
    FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.w = b.w
    ORDER BY g.user_id, g.w
    """,
    doc="Dense time axis (ClickHouse WITH FILL): per-key sequence() grid "
    "left-joined to hourly rollup; grid generation is distributed by key.",
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        table(spark, sf_dir, "events")
        .where((F.col("event_type") == "purchase") & (F.col("user_id") < 8))
    )
    b = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("w")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv")
    )
    grid = (
        b.groupBy("user_id")
        .agg(F.min("w").alias("lo"), F.max("w").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("w"),
        )
    )
    return (
        grid.join(b, ["user_id", "w"], "left")
        .select(
            "user_id",
            "w",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.round(F.coalesce("sv", F.lit(0.0)), 4).alias("sv"),
        )
        .orderBy("user_id", "w")
    )


@register(
    "q36_dist_windows",
    """
    SELECT o_orderkey, o_orderstatus,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 4) AS prank,
           round(cume_dist()    OVER w, 4) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
    doc="Distribution window functions: ntile / percent_rank / cume_dist.",
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("prank"),
            F.round(F.cume_dist().over(w), 4).alias("cdist"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q37_histogram",
    """
    SELECT cast(least(floor(value / 50.0), 9) AS bigint) AS bucket,
           count(*) AS cnt, round(sum(value), 4) AS sv
    FROM events GROUP BY 1 ORDER BY 1
    """,
    doc="Fixed-width histogram of event values (value range 0..~490 -> "
    "10 buckets, clamped); single partial-agg shuffle.",
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("long")
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sv"))
        .orderBy("bucket")
    )


@register(
    "q45_scalar_subquery",
    """
    SELECT o_orderstatus, count(*) AS cnt FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Scalar subquery: global-avg threshold (subquery result broadcast "
    "to the filter — no re-shuffle of the fact side).",
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_q45_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS cnt FROM _q45_orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM _q45_orders)
        GROUP BY o_orderstatus ORDER BY o_orderstatus
        """
    )


@register(
    "q46_in_subquery",
    """
    SELECT c_custkey, c_nationkey FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name LIKE '%1_')
    ORDER BY c_custkey
    """,
    doc="IN-subquery (planned as broadcast left-semi join against the "
    "filtered dim).",
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").where(F.col("n_name").like("%1_"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left_semi")
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey")
    )


@register(
    "text_bm25",
    """
    WITH w AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
      FROM documents
    ), t AS (
      SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
        CAST(len(list_filter(w, x -> x = 'data')) AS DOUBLE) AS tf0,
        CAST(len(list_filter(w, x -> x = 'model')) AS DOUBLE) AS tf1,
        CAST(len(list_filter(w, x -> x = 'spark')) AS DOUBLE) AS tf2
      FROM w
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
        sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
        sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
        sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
      FROM t
    )
    SELECT doc_id, ROUND(
        (CASE WHEN tf0 > 0 THEN ln((n_docs - df0 + 0.5)/(df0 + 0.5) + 1.0) * tf0 * 2.2 / (tf0 + 1.2*(0.25 + 0.75*dl/avgdl)) ELSE 0.0 END)
      + (CASE WHEN tf1 > 0 THEN ln((n_docs - df1 + 0.5)/(df1 + 0.5) + 1.0) * tf1 * 2.2 / (tf1 + 1.2*(0.25 + 0.75*dl/avgdl)) ELSE 0.0 END)
      + (CASE WHEN tf2 > 0 THEN ln((n_docs - df2 + 0.5)/(df2 + 0.5) + 1.0) * tf2 * 2.2 / (tf2 + 1.2*(0.25 + 0.75*dl/avgdl)) ELSE 0.0 END), 4) AS bm25
    FROM t, s
    WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0
    ORDER BY doc_id
    """,
    doc=(
        "BM25 ranked retrieval (k1=1.2, b=0.75) for the fixed query "
        "{data, model, spark}: per-doc tf via codegen'd array ops, corpus "
        "stats (N, avgdl, df) as ONE broadcast aggregate row - a single "
        "reduction regardless of corpus size."
    ),
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import bm25_scores

    d = table(spark, sf_dir, "documents")
    scored = bm25_scores(d, ["data", "model", "spark"])
    return scored.select("doc_id", F.round("bm25", 4).alias("bm25")).orderBy("doc_id")


@register(
    "text_search",
    """
    SELECT lang, count(*) AS cnt,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM documents WHERE text LIKE '%data%' AND text LIKE '%spark%'
    GROUP BY lang ORDER BY lang
    """,
    doc="Log-search shape (logs table ORDER BY + bloom indexes, "
    "res/schema.sql:93-98): conjunctive substring search + facet counts. "
    "contains() stays in whole-stage codegen; at scale the same predicate "
    "is served by parquet bloom filters on tokenized columns.",
)
def text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.where(F.col("text").contains("data") & F.col("text").contains("spark"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang")
    )


def _register_hybrid_rrf() -> None:
    """Registered via a builder so the oracle can splice in the already-
    registered text_bm25 SQL and the shared cosine exprs verbatim —
    one source of truth for both ranking lists."""
    from yamon_spark.queries import REGISTRY
    from yamon_spark.queries.pipeline_ops import _COS_EXPRS

    bm25_sql = REGISTRY["text_bm25"].oracle

    @register(
        "hybrid_rank_rrf",
        f"""
        WITH bm_all AS ({bm25_sql}),
        bm100 AS (SELECT doc_id, bm25 FROM bm_all ORDER BY bm25 DESC, doc_id LIMIT 100),
        bmr AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_bm
                FROM bm100),
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        cs AS (
          SELECT e.vec_id AS doc_id, {_COS_EXPRS}
          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
        ), c_all AS (
          SELECT doc_id, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim FROM cs
        ),
        c100 AS (SELECT doc_id, cos_sim FROM c_all ORDER BY cos_sim DESC, doc_id LIMIT 100),
        csr AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS r_cos
                FROM c100),
        f AS (
          SELECT COALESCE(bmr.doc_id, csr.doc_id) AS doc_id,
                 COALESCE(1.0 / (60 + r_bm), 0) + COALESCE(1.0 / (60 + r_cos), 0) AS rrf
          FROM bmr FULL JOIN csr ON bmr.doc_id = csr.doc_id
        )
        SELECT doc_id, ROUND(rrf, 6) AS rrf FROM f ORDER BY rrf DESC, doc_id LIMIT 20
        """,
        doc=(
            "Hybrid retrieval via reciprocal rank fusion (k=60): the BM25 "
            "lexical list and the cosine dense list each cut to a bounded "
            "top-100 (TakeOrdered — no global sort), ranks fused "
            "full-outer. The lists are tiny by construction, so fusion "
            "cost is independent of corpus size."
        ),
    )
    def hybrid_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from yamon_spark.operators.similarity import cosine_sim
        from yamon_spark.operators.text import bm25_scores

        docs = table(spark, sf_dir, "documents")
        bm = (
            bm25_scores(docs, ["data", "model", "spark"])
            .select("doc_id", F.round("bm25", 4).alias("bm25"))
            .orderBy(F.col("bm25").desc(), "doc_id")
            .limit(100)
        )
        bmr = bm.withColumn(
            "r_bm",
            F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id")).cast("bigint"),
        ).select("doc_id", "r_bm")

        emb = table(spark, sf_dir, "embeddings")
        q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
        cs = (
            emb.where(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select(
                F.col("vec_id").alias("doc_id"),
                F.round(cosine_sim(F.col("embedding"), F.col("q_emb")), 4).alias("cos_sim"),
            )
            .orderBy(F.col("cos_sim").desc(), "doc_id")
            .limit(100)
        )
        csr = cs.withColumn(
            "r_cos",
            F.row_number().over(Window.orderBy(F.col("cos_sim").desc(), "doc_id")).cast("bigint"),
        ).select("doc_id", "r_cos")

        # fusion as union + groupBy-sum rather than a FULL OUTER join:
        # full outer can't broadcast (Spark falls back to sort-merge), and
        # union-of-contributions is the shape that stays a single tiny
        # shuffle however many rankers are fused (<= 2 addends per doc, so
        # the float sum is order-independent)
        fused = (
            bmr.select("doc_id", (F.lit(1.0) / (F.lit(60) + F.col("r_bm"))).alias("c"))
            .unionByName(
                csr.select("doc_id", (F.lit(1.0) / (F.lit(60) + F.col("r_cos"))).alias("c"))
            )
            .groupBy("doc_id")
            .agg(F.sum("c").alias("rrf"))
        )
        return (
            fused.select("doc_id", F.round("rrf", 6).alias("rrf"))
            .orderBy(F.col("rrf").desc(), "doc_id")
            .limit(20)
        )


_register_hybrid_rrf()
