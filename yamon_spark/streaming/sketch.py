"""Live count-min sketch — the streaming twin of
``text.count_min_sketch`` (the pattern every other batch op has: heavy
hitters, EWMA, autocorr, near-dup triage, the corpus pipeline, IVF
maintenance).

The batch operator's counter build (`text.cms_counters`) is a plain
explode + groupBy count, which Structured Streaming runs natively as a
streaming aggregation: engine-managed state bounded at depth x width
rows BY CONSTRUCTION, regardless of stream length or vocabulary — the
whole point of sketching is that this is the table you can afford to
keep per source/day when exact per-word counts are not. No custom
stateful operator needed; the sketch IS the aggregation state.

Output: complete-mode counters through foreachBatch, dynamic-overwriting
the sketch parquet every trigger — each write is the full current
sketch, so replays are trivially idempotent and readers always see a
consistent table. Query the sketch with ``cms_estimate`` (min-over-rows,
the one-sided est >= exact guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from yamon_spark.streaming.corpus import parse_doc_lines


def start_count_min(
    spark: SparkSession,
    landing_dir: str,
    out_path: str,
    checkpoint_dir: str,
    width: int = 64,
    depth: int = 4,
    trigger: dict | None = None,
    query_name: str = "cms_live",
) -> StreamingQuery:
    """Start the live CMS: landed JSON doc lines -> word stream ->
    depth x width streaming counter aggregation -> complete-mode
    overwrite of the sketch parquet per trigger."""
    from yamon_spark.operators.text import cms_counters

    docs = parse_doc_lines(spark.readStream.text(landing_dir))
    counters = cms_counters(docs, width=width, depth=depth)

    def write_sketch(batch: DataFrame, epoch: int) -> None:
        batch.write.mode("overwrite").parquet(out_path)

    return (
        counters.writeStream.outputMode("complete")
        .foreachBatch(write_sketch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def cms_estimate(spark: SparkSession, sketch_path: str, words: list[str], width: int = 64) -> DataFrame:
    """Point-frequency estimates from a persisted sketch: min over the
    depth rows of each queried word's counters (est >= exact, one-sided).
    The query side is a bounded words x depth frame hash-joined against
    the <= depth x width counter table."""
    from yamon_spark.operators.text import _cms_bucket

    cms = spark.read.parquet(sketch_path)
    depth = cms.agg(F.max("i")).first()[0] + 1
    q = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), _cms_bucket(F.col("w"), i, width).alias("b"))
                    for i in range(int(depth))
                ]
            )
        ).alias("s"),
    ).select("w", F.col("s.i").alias("i"), F.col("s.b").alias("b"))
    return (
        q.join(F.broadcast(cms), ["i", "b"])
        .groupBy("w")
        .agg(F.min("c").alias("est_n"))
        .select(F.col("w").alias("word"), "est_n")
        .orderBy("word")
    )
