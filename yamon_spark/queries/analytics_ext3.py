"""Third extension batch: lateral explode, bitmap exact-distinct, and
array zip — rounding out the SQL surface with the remaining
ClickHouse-isms (ARRAY JOIN, groupBitmap) and array HOFs.

- q74 is ClickHouse ``ARRAY JOIN`` / Hive ``LATERAL VIEW``: unnest an
  array column with its ordinality, through the SQL front-end.
- q75 is ``groupBitmap`` (exact distinct counts via roaring-bitmap-style
  aggregation): Spark's bitmap_construct_agg partials are mergeable the
  same way HLL sketches are (q66) but EXACT — the right tool when ids
  are dense ints and exactness matters. Grouped by bitmap bucket so ids
  beyond one bucket's 32k-bit range still count correctly at any scale.
- q76 exercises zip_with + aggregate (element-wise combine then fold) —
  the JVM-side form of every vector kernel in the similarity operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yamon_spark.queries import register, table


@register(
    "q74_lateral_explode",
    """
    SELECT vec_id, pos, round(CAST(x AS DOUBLE), 4) AS x FROM (
      SELECT vec_id, 0 AS pos, embedding[1] AS x FROM embeddings
      UNION ALL SELECT vec_id, 1, embedding[2] FROM embeddings
      UNION ALL SELECT vec_id, 2, embedding[3] FROM embeddings)
    ORDER BY vec_id, pos
    """,
    doc="LATERAL VIEW posexplode (ClickHouse ARRAY JOIN): unnest with "
    "ordinality via the SQL front-end, first 3 positions per vector.",
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "embeddings").createOrReplaceTempView("_q74_emb")
    return spark.sql(
        """
        SELECT vec_id, pos, round(CAST(x AS DOUBLE), 4) AS x
        FROM _q74_emb LATERAL VIEW posexplode(embedding) t AS pos, x
        WHERE pos < 3
        ORDER BY vec_id, pos
        """
    )


@register(
    "q75_bitmap_distinct",
    """
    SELECT event_type, count(DISTINCT user_id) AS uniq_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="groupBitmap semantics: EXACT distinct counts from mergeable "
    "bitmap partials (bitmap_construct_agg per bucket, counts summed "
    "across buckets) — matches COUNT(DISTINCT) exactly, unlike HLL.",
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bucket")
    ).agg(F.expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))").alias("n"))
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum("n").alias("uniq_users"))
        .orderBy("event_type")
    )


@register(
    "q76_zip_with",
    """
    SELECT vec_id,
           round(list_reduce(list_transform(range(1, len(embedding) + 1),
                 i -> CAST(embedding[i] AS DOUBLE)
                      * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE)),
                 (a, b) -> a + b), 4) AS rdot
    FROM embeddings ORDER BY vec_id
    """,
    doc="zip_with + aggregate: element-wise product of a vector with its "
    "reverse, folded to a scalar — the array-HOF vector-kernel shape.",
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    prods = F.zip_with(
        "embedding",
        F.reverse("embedding"),
        lambda a, b: a.cast("double") * b.cast("double"),
    )
    base = e.select("vec_id", prods.alias("p"))
    rdot = F.round(F.aggregate("p", F.lit(0.0), lambda acc, x: acc + x), 4)
    return base.select("vec_id", rdot.alias("rdot")).orderBy("vec_id")


@register(
    "q77_cube_grouping",
    """
    SELECT grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
           o_orderstatus, o_orderpriority, count(*) AS cnt
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="CUBE with grouping metadata: all four aggregation levels in one "
    "pass, grouping() bits distinguishing real NULLs from rollup rows.",
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    # grouping() is only legal inside the cube's agg list
    gid = (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).alias("gid")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(gid, F.count(F.lit(1)).alias("cnt"))
        .select("gid", "o_orderstatus", "o_orderpriority", "cnt")
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "q78_median_stats",
    """
    SELECT event_type,
           round(median(value), 4) AS med,
           round(stddev_samp(value), 4) AS sd,
           round(var_samp(value), 4) AS vr
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Robust statistics per group: interpolated median (exact), "
    "sample stddev/variance.",
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.median("value"), 4).alias("med"),
            F.round(F.stddev_samp("value"), 4).alias("sd"),
            F.round(F.var_samp("value"), 4).alias("vr"),
        )
        .orderBy("event_type")
    )


@register(
    "q79_fuzzy_match",
    """
    WITH p AS (SELECT p_partkey, p_name,
                      split_part(p_name, ' ', 1) || '|' || split_part(p_name, ' ', 2) AS blk
               FROM part WHERE p_partkey % 7 = 0)
    SELECT a.p_partkey AS pa, b.p_partkey AS pb,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM p a JOIN p b
      ON a.blk = b.blk AND a.p_partkey < b.p_partkey
     AND abs(length(a.p_name) - length(b.p_name)) <= 3
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY pa, pb
    """,
    doc="Fuzzy near-dup pairs by edit distance with two-token blocking — "
    "the O(n²) pair space never materializes beyond each block (same "
    "blocking discipline as the embedding near-dup operator). Length "
    "difference > threshold implies distance > threshold, so the cheap "
    "length prefilter runs inside the join; Spark evaluates the "
    "threshold-limited levenshtein (banded DP, early exit). Declared "
    "over a deterministic 1-in-7 slice: this corpus's names form "
    "near-identical families (every block candidate matches), so the "
    "full pair listing is O(big) by construction, not by plan.",
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = F.split("p_name", " ")
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 7 == 0)
        .select("p_partkey", "p_name", F.concat_ws("|", w.getItem(0), w.getItem(1)).alias("blk"))
    )
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 3)
    cond = (
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (F.abs(F.length(F.col("a.p_name")) - F.length(F.col("b.p_name"))) <= 3)
    )
    return (
        a.join(b, cond)
        .select(F.col("a.p_partkey").alias("pa"), F.col("b.p_partkey").alias("pb"), dist.alias("dist"))
        .where((F.col("dist") >= 0) & (F.col("dist") <= 3))
        .orderBy("pa", "pb")
    )


@register(
    "q82_deadman",
    """
    WITH last_seen AS (
      SELECT user_id, max(epoch_us(ts)) AS last_us, count(*) AS n_events
      FROM events GROUP BY user_id
    ), horizon AS (SELECT max(last_us) AS now_us FROM last_seen)
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(now_us - last_us AS BIGINT) AS silence_us,
           CAST(CASE WHEN now_us - last_us > 3600000000 THEN 1 ELSE 0 END AS INT) AS stale
    FROM last_seen CROSS JOIN horizon
    ORDER BY user_id
    """,
    doc=(
        "Deadman / staleness check — which series went silent: per-key "
        "last event time vs the corpus horizon, stale flag past 1 h. One "
        "partial-agg groupBy + a 1-row horizon broadcast; the alerting "
        "query every monitoring engine runs on a schedule (the reference "
        "agent's 5 s cadence makes silence a first-class failure signal)."
    ),
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    last_seen = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    horizon = last_seen.agg(F.max("last_us").alias("now_us"))
    return (
        last_seen.crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            (F.col("now_us") - F.col("last_us")).cast("bigint").alias("silence_us"),
            (F.col("now_us") - F.col("last_us") > 3_600_000_000).cast("int").alias("stale"),
        )
        .orderBy("user_id")
    )


@register(
    "q83_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    )
    SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    ORDER BY n DESC, from_type, to_type
    """,
    doc=(
        "Event-sequence transition matrix (ClickHouse sequence-function "
        "family): adjacent event-type pairs per user timeline via lead() "
        "over (user, time) — one window shuffle on the user key, then a "
        "partial-agg pair count. The Markov-chain input for funnel and "
        "path analysis."
    ),
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "from_type", "to_type")
    )


@register(
    "q84_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS dev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, round(d.value, 4) AS value,
           round(d.med, 4) AS med, round(m.mad, 4) AS mad
    FROM dev d JOIN mad m USING (event_type)
    WHERE d.dev > 3 * m.mad
    ORDER BY d.event_id
    """,
    doc=(
        "Robust outlier detection per event type: flag rows whose "
        "|value - median| exceeds 3x the median absolute deviation — the "
        "alerting statistic that, unlike z-scores (q71), is immune to the "
        "outliers it hunts. Plan: two grouped exact medians over the "
        "handful of event types, each joined back via broadcast (the "
        "per-type stats rows are tiny); the flag itself is a projection. "
        "At corpus scale swap percentile for approx_percentile (q38 "
        "demonstrates the sketch) — the two-pass broadcast shape is "
        "unchanged."
    ),
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5D)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(dev, 0.5D)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("dev") > 3 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
        )
        .orderBy("event_id")
    )


@register(
    "q85_histogram_quantile",
    """
    WITH b AS (
      SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bkt,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, bkt
    ),
    c AS (
      SELECT event_type, bkt, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY bkt
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS total
      FROM b
    ),
    qs AS (SELECT unnest([0.5, 0.95]) AS q),
    hit AS (
      SELECT c.event_type, qs.q, c.bkt, c.n, c.cum, c.total,
             qs.q * c.total AS thresh
      FROM c CROSS JOIN qs
      WHERE c.cum >= qs.q * c.total AND (c.cum - c.n) < qs.q * c.total
    )
    SELECT event_type, q,
           round(bkt * 5.0 + 5.0 * (thresh - (cum - n)) / n, 4) AS est
    FROM hit ORDER BY event_type, q
    """,
    doc=(
        "PromQL-style histogram_quantile: per event type, bucket values "
        "into fixed 5-unit bins, then estimate p50/p95 by linear "
        "interpolation inside the bucket where the cumulative count "
        "crosses q*total. The monitoring-native quantile — mergeable "
        "bucket counts instead of a value buffer, so at 100 TB the "
        "partial-agg histogram is tiny and the interpolation runs over "
        "|types|x|buckets| rows. Pairs with q37 (the histogram) and q38 "
        "(the sketch-vs-exact gate)."
    ),
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    width = 5.0
    b = ev.groupBy(
        "event_type", F.floor(F.col("value") / width).cast("bigint").alias("bkt")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wc = Window.partitionBy("event_type").orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy("event_type")
    c = b.select(
        "event_type", "bkt", "n", F.sum("n").over(wc).alias("cum"), F.sum("n").over(wt).alias("total")
    )
    qs = spark.createDataFrame([(0.5,), (0.95,)], "q double")
    thresh = F.col("q") * F.col("total")
    hit = c.crossJoin(F.broadcast(qs)).where(
        (F.col("cum") >= thresh) & ((F.col("cum") - F.col("n")) < thresh)
    )
    return hit.select(
        "event_type",
        "q",
        F.round(
            F.col("bkt") * width + width * (thresh - (F.col("cum") - F.col("n"))) / F.col("n"), 4
        ).alias("est"),
    ).orderBy("event_type", "q")
