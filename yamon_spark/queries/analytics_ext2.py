"""Second extension batch: conditional aggregates, approx quantiles,
correlated subqueries, CTE reuse, value windows, struct/conditional/regex
scalar surfaces, event interval joins, and corpus bigram counts.

Monitoring-store shapes the reference's schema implies but SURVEY §2.5
didn't yet enumerate:

- q39 is the ``arg_max``/``count_if`` family every alerting UI issues
  ("which probe hit the max?") — served by the same ORDER BY keys as the
  rate queries (reference res/schema.sql:15-20).
- q65 is the batch-equivalent of a watermarked stream-stream interval
  join (alert ⋈ events-in-preceding-window per host) — the Structured
  Streaming analogue bounds state with watermarks on both sides.
- text_bigrams is the corpus-statistics shape of a training-data
  pipeline (top n-grams for tokenizer/quality work) over `documents`.

Scale notes: every query is one shuffle except q48 (self-join of a
~|months| aggregate — both sides re-aggregate; at scale persist the CTE
or let AQE reuse the exchange) and q65 (equi-key join on user_id with a
time-range residual; the range predicate filters inside the sort-merge
group, state bounded by the 30-minute window at stream scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yamon_spark.operators.text import words_col
from yamon_spark.queries import register, table


@register(
    "q38_approx_quantile",
    "SELECT TRUE AS within_tolerance",
    doc="approx_percentile (median, accuracy 10k) within ±2% of the exact "
    "interpolated percentile — the sketch path percentiles take at 100 TB.",
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    )
    return agg.select(
        ((F.col("approx") >= F.col("exact") * 0.98) & (F.col("approx") <= F.col("exact") * 1.02)).alias(
            "within_tolerance"
        )
    )


@register(
    "q39_cond_aggs",
    """
    SELECT event_type,
           struct_extract(max({'v': value, 'id': event_id}), 'id') AS id_at_max,
           struct_extract(min({'v': value, 'id': event_id}), 'id') AS id_at_min,
           count(*) FILTER (WHERE value > 250) AS n_hi,
           bool_or(value > 490)  AS any_hi,
           bool_and(value >= 0)  AS all_nonneg
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Conditional aggregates: arg extremes, count_if, bool_or/bool_and "
    "— one partial-agg shuffle. Extremes use lexicographic (value, "
    "event_id) struct min/max instead of max_by/arg_max: sf0.1 has "
    "VALUE TIES per group, where bare arg extremes are engine-dependent "
    "(caught by the r13 sf0.1 oracle sweep); the struct key makes the "
    "tie-break deterministic in both engines (max picks the largest id "
    "among max-value ties, min the smallest among min-value ties).",
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    pair = F.struct(F.col("value").alias("v"), F.col("event_id").alias("id"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.max(pair)["id"].alias("id_at_max"),
            F.min(pair)["id"].alias("id_at_min"),
            F.count_if(F.col("value") > 250).alias("n_hi"),
            F.bool_or(F.col("value") > 490).alias("any_hi"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        )
        .orderBy("event_type")
    )


@register(
    "q44_union_all",
    """
    SELECT nk, count(*) AS cnt FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL SELECT s_nationkey FROM supplier)
    GROUP BY nk ORDER BY nk
    """,
    doc="UNION ALL (bag semantics; no dedup shuffle) + fold to counts.",
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).groupBy("nk").agg(F.count(F.lit(1)).alias("cnt")).orderBy("nk")


@register(
    "q47_exists_correlated",
    """
    SELECT n_name FROM nation n
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
    ORDER BY n_name
    """,
    doc="Correlated EXISTS through the SQL front-end (decorrelated by "
    "Catalyst into a left-semi hash join — same physical plan as q12).",
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("_q47_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("_q47_customer")
    return spark.sql(
        """
        SELECT n_name FROM _q47_nation n
        WHERE EXISTS (SELECT 1 FROM _q47_customer c
                      WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
        ORDER BY n_name
        """
    )


@register(
    "q48_cte_reuse",
    """
    WITH monthly AS (
      SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mk,
             sum(o_totalprice) AS s
      FROM orders GROUP BY 1)
    SELECT m.mk, round(m.s, 4) AS s, round(m.s - p.s, 4) AS mom
    FROM monthly m LEFT JOIN monthly p ON p.mk = m.mk - 1
    ORDER BY m.mk
    """,
    doc="CTE referenced twice: month-over-month revenue delta via "
    "self-join on the previous month key (integer month arithmetic — "
    "engine-neutral, no interval/date-type coercion).",
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    mk = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mk")
    monthly = o.groupBy(mk).agg(F.sum("o_totalprice").alias("s"))
    m, p = monthly.alias("m"), monthly.alias("p")
    return (
        m.join(p, F.col("p.mk") == F.col("m.mk") - 1, "left")
        .select(
            F.col("m.mk").alias("mk"),
            F.round(F.col("m.s"), 4).alias("s"),
            F.round(F.col("m.s") - F.col("p.s"), 4).alias("mom"),
        )
        .orderBy("mk")
    )


@register(
    "q49_first_last_window",
    """
    SELECT user_id, event_id,
           round(first_value(value) OVER w, 4) AS first_v,
           round(last_value(value)  OVER w, 4) AS last_v,
           round(nth_value(value, 2) OVER w, 4) AS second_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id, event_id
    """,
    doc="Value window functions over the full partition frame: "
    "first_value / last_value / nth_value per series.",
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.first("value").over(w), 4).alias("first_v"),
            F.round(F.last("value").over(w), 4).alias("last_v"),
            F.round(F.nth_value("value", 2).over(w), 4).alias("second_v"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q56_struct_ops",
    """
    SELECT p_partkey, s.brand AS brand, s.size + 1 AS size1
    FROM (SELECT p_partkey,
                 struct_pack(brand := p_brand, size := p_size) AS s
          FROM part) t
    ORDER BY p_partkey
    """,
    doc="Struct build + field access (named_struct / getField) — the "
    "typed-row shape wire records take between parse and sink.",
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    s = F.struct(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
    return (
        p.select("p_partkey", s.alias("s"))
        .select("p_partkey", F.col("s.brand").alias("brand"), (F.col("s.size") + 1).alias("size1"))
        .orderBy("p_partkey")
    )


@register(
    "q57_conditionals",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_band,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS rf,
           round(CAST(greatest(l_tax, l_discount) AS DOUBLE), 4) AS hi_rate,
           round(CAST(least(l_quantity, 10.0) AS DOUBLE), 4) AS lo_qty,
           CASE WHEN l_linenumber = 1 THEN 'first' ELSE 'rest' END AS pos
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    doc="Conditional scalar surface: CASE chains, coalesce/nullif, "
    "greatest/least, if() — all whole-stage-codegen row expressions.",
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    qty_band = (
        F.when(F.col("l_quantity") < 10, "low").when(F.col("l_quantity") < 30, "mid").otherwise("high")
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            qty_band.alias("qty_band"),
            F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("rf"),
            F.round(F.greatest("l_tax", "l_discount").cast("double"), 4).alias("hi_rate"),
            F.round(F.least("l_quantity", F.lit(10.0)).cast("double"), 4).alias("lo_qty"),
            F.when(F.col("l_linenumber") == 1, "first").otherwise("rest").alias("pos"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q58_regex_funcs",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_matches(p_name, '^[a-z]+ ') AS has_prefix,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled
    FROM part ORDER BY p_partkey
    """,
    doc="Regex scalar surface: extract / match / global replace (the "
    "log-line field-extraction shape, reference journald.go tag pulls).",
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
            F.col("p_name").rlike(r"^[a-z]+ ").alias("has_prefix"),
            F.regexp_replace("p_name", "[aeiou]", "").alias("devoweled"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q65_interval_join",
    """
    SELECT a.event_id, count(d.event_id) AS n_recent_clicks
    FROM (SELECT * FROM events WHERE event_type = 'error') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') d
      ON a.user_id = d.user_id
     AND d.ts >= a.ts - INTERVAL 30 MINUTE AND d.ts < a.ts
    GROUP BY a.event_id ORDER BY a.event_id
    """,
    doc="Interval join: clicks in the 30 minutes before each error, per "
    "user — batch form of the watermarked stream-stream interval join "
    "(state bounded by the window width on both sides).",
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "error").alias("a")
    d = ev.where(F.col("event_type") == "click").alias("d")
    cond = (
        (F.col("a.user_id") == F.col("d.user_id"))
        & (F.col("d.ts") >= F.col("a.ts") - F.expr("INTERVAL 30 MINUTE"))
        & (F.col("d.ts") < F.col("a.ts"))
    )
    return (
        a.join(d, cond, "left")
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count(F.col("d.event_id")).alias("n_recent_clicks"))
        .orderBy("event_id")
    )


@register(
    "text_bigrams",
    """
    WITH t AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
    b AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram FROM t)
    SELECT bigram, count(*) AS cnt FROM b
    GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20
    """,
    doc="Corpus top-20 bigrams: materialized word arrays → adjacent-pair "
    "transform → explode → one partial-agg shuffle → TakeOrdered. The "
    "tokenizer-corpus-statistics shape of a training-data pipeline.",
)
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    base = d.select(words_col(F.col("text")).alias("w")).where(F.size("w") >= 2)
    # w[i] is 0-based in Spark SQL; sequence(1, size-1) yields each
    # adjacent pair once. w stays a materialized column reference (the
    # interpreted-HOF re-eval gotcha).
    pairs = base.select(
        F.explode(F.expr("transform(sequence(1, size(w) - 1), i -> concat_ws(' ', w[i-1], w[i]))")).alias(
            "bigram"
        )
    )
    return (
        pairs.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


@register(
    "q69_time_range_window",
    """
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                                  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 4)
             AS avg_10m
    FROM events ORDER BY user_id, event_id
    """,
    doc="Time-based window frame: per-series trailing 10-minute average "
    "(RANGE frame over event time, not row count) — the moving-average "
    "shape dashboards actually want on irregular series.",
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    return (
        ev.select("user_id", "event_id", F.round(F.avg("value").over(w), 4).alias("avg_10m"))
        .orderBy("user_id", "event_id")
    )


@register(
    "q73_unpivot",
    """
    SELECT p_partkey, metric, val FROM (
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS val FROM part)
    ORDER BY p_partkey, metric
    """,
    doc="UNPIVOT (wide -> long, the melt every metrics exporter "
    "performs): native unpivot operator, no join or union re-scan.",
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.col("p_size").cast("double").alias("size"),
                 F.col("p_retailprice").cast("double").alias("retailprice"))
        .unpivot(["p_partkey"], ["size", "retailprice"], "metric", "val")
        .orderBy("p_partkey", "metric")
    )


@register(
    "text_pmi",
    r"""
    WITH t AS (SELECT regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
    u AS (SELECT unnest(w) AS word FROM t),
    uc AS (SELECT word, count(*) AS c FROM u GROUP BY word),
    tw AS (SELECT CAST(sum(c) AS DOUBLE) AS t_w FROM uc),
    p AS (SELECT unnest(list_transform(range(1, len(w)), i -> {'x': w[i], 'y': w[i+1]})) AS s FROM t),
    bc AS (SELECT s.x AS x, s.y AS y, count(*) AS c_xy FROM p GROUP BY s.x, s.y),
    tb AS (SELECT CAST(sum(c_xy) AS DOUBLE) AS t_b FROM bc),
    f AS (SELECT * FROM bc WHERE c_xy >= 5)
    SELECT f.x || ' ' || f.y AS bigram, CAST(f.c_xy AS BIGINT) AS cnt,
           ROUND(ln((f.c_xy / t_b) / ((ux.c / t_w) * (uy.c / t_w))), 4) AS pmi
    FROM f JOIN uc ux ON f.x = ux.word JOIN uc uy ON f.y = uy.word
    CROSS JOIN tw CROSS JOIN tb
    ORDER BY pmi DESC, bigram LIMIT 20
    """,
    doc=(
        "Top-20 collocations by pointwise mutual information (min bigram "
        "count 5): unigram + bigram partial-agg counts, the FILTERED "
        "bigram set broadcast against the unigram table twice, totals as "
        "two 1-row broadcasts. Rank on rounded PMI for engine parity."
    ),
)
def text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    base = d.select(words_col(F.col("text")).alias("w"))
    uni = base.select(F.explode("w").alias("word")).groupBy("word").agg(
        F.count(F.lit(1)).alias("c")
    )
    tw = uni.agg(F.sum("c").cast("double").alias("t_w"))
    pairs = (
        base.where(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS x, w[i] AS y))")
            ).alias("p")
        )
        .select("p.x", "p.y")
    )
    big = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    tb = big.agg(F.sum("c_xy").cast("double").alias("t_b"))
    filt = F.broadcast(big.where(F.col("c_xy") >= 5))
    ux = uni.withColumnRenamed("word", "x").withColumnRenamed("c", "c_x")
    uy = uni.withColumnRenamed("word", "y").withColumnRenamed("c", "c_y")
    scored = (
        filt.join(ux, "x").join(uy, "y").crossJoin(F.broadcast(tw)).crossJoin(F.broadcast(tb))
    )
    pmi = F.round(
        F.log(
            (F.col("c_xy") / F.col("t_b"))
            / ((F.col("c_x") / F.col("t_w")) * (F.col("c_y") / F.col("t_w")))
        ),
        4,
    )
    return (
        scored.select(
            F.concat_ws(" ", "x", "y").alias("bigram"),
            F.col("c_xy").cast("bigint").alias("cnt"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(20)
    )
