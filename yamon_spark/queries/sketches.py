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
