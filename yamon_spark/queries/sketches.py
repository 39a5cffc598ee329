"""Mergeable-sketch rollups: the 100 TB path for distinct counts.

ClickHouse rollup MVs keep ``uniqState`` partials that ``uniqMerge``
combines at read time; the Spark-native equivalent is Datasketches HLL:
``hll_sketch_agg`` per rollup window (the MV state), ``hll_union_agg``
across windows at query time, ``hll_sketch_estimate`` at the edge. The
reference's own MVs (res/schema.sql:39-50,71-82) only keep avg/sum
partials — sketch state is the natural extension its `uniq` dashboards
would need, and the whole point is that partials MERGE: a year of
1-minute windows collapses without ever re-reading detail rows.

Correctness contract: estimates are compared against the oracle's exact
COUNT(DISTINCT ...) with a tolerance boolean (same pattern as Q22/Q38 —
sketches are not bit-reproducible across engines, booleans are).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yamon_spark.queries import register, table


@register(
    "q66_hll_rollup_merge",
    """
    SELECT event_type, TRUE AS within_tolerance
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="HLL sketch state per 1-hour rollup window, merged across "
    "windows per event_type; merged estimate within ±5% of exact "
    "distinct users (uniqState/uniqMerge semantics on Spark).",
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # the rollup MV state: one sketch per (window, type) — this is what
    # the streaming pipeline would persist alongside avg/sum partials
    sk = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    # read-time merge across windows: no detail re-scan
    merged = sk.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact"))
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            (
                (F.col("est") >= F.col("exact") * 0.95) & (F.col("est") <= F.col("exact") * 1.05)
            ).alias("within_tolerance"),
        )
        .orderBy("event_type")
    )


@register(
    "sketch_count_min",
    """
    WITH w AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents
    ),
    cms AS (
      SELECT i, CAST('0x' || substr(md5(w || ':' || i), 1, 8) AS BIGINT) % 64 AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM w, range(0, 4) t(i) GROUP BY 1, 2
    ),
    top AS (
      SELECT w, CAST(count(*) AS BIGINT) AS exact_n FROM w GROUP BY w
      ORDER BY exact_n DESC, w LIMIT 50
    ),
    qb AS (
      SELECT top.w, top.exact_n, i,
             CAST('0x' || substr(md5(top.w || ':' || i), 1, 8) AS BIGINT) % 64 AS b
      FROM top, range(0, 4) t(i)
    )
    SELECT qb.w AS word, qb.exact_n, min(cms.c) AS est_n,
           min(cms.c) - qb.exact_n AS overcount
    FROM qb JOIN cms ON cms.i = qb.i AND cms.b = qb.b
    GROUP BY qb.w, qb.exact_n
    ORDER BY qb.exact_n DESC, word
    """,
    doc=(
        "Count-min sketch over the corpus word stream: depth 4 x width "
        "64 integer counters in one pass (the sketch IS the partial "
        "aggregate — map-side combine into <=256 cells), estimates by "
        "min-over-rows with the one-sided est >= exact guarantee, "
        "audited against exact counts for the top-50 words. The "
        "mergeable point-frequency twin of the HLL distinct sketch; "
        "buckets from the portable md5-hex idiom."
    ),
)
def sketch_count_min_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yamon_spark.operators.text import count_min_sketch

    return count_min_sketch(table(spark, sf_dir, "documents"), width=64, depth=4, top_n=50)
