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
        # the sketch's GEOMETRY travels with it: width/depth are stamped
        # as columns so cms_estimate hashes with the width the sketch was
        # BUILT with — a caller-supplied width that disagreed silently
        # produced plausible-looking but wrong estimates
        batch.withColumn("width", F.lit(int(width))).withColumn(
            "depth", F.lit(int(depth))
        ).write.mode("overwrite").parquet(out_path)

    return (
        counters.writeStream.outputMode("complete")
        .foreachBatch(write_sketch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def cms_estimate(
    spark: SparkSession, sketch_path: str, words: list[str], width: int | None = None
) -> DataFrame:
    """Point-frequency estimates from a persisted sketch: min over the
    depth rows of each queried word's counters (est >= exact, one-sided).
    The query side is a bounded words x depth frame hash-joined against
    the <= depth x width counter table.

    Geometry comes FROM THE SKETCH: width/depth are read back from the
    stamped columns start_count_min persists (querying with a different
    width than the sketch was built with hashes to the wrong buckets and
    returns plausible-looking but wrong numbers — never trusted to a
    parameter). The `width` argument remains only for legacy sketches
    written before the stamp; an empty sketch raises rather than
    producing a None-depth crash downstream."""
    from yamon_spark.operators.text import _cms_bucket

    cms = spark.read.parquet(sketch_path)
    if "width" in cms.columns and "depth" in cms.columns:
        geo = cms.select("width", "depth").first()
        if geo is None:
            raise ValueError(f"empty count-min sketch at {sketch_path}")
        width, depth = int(geo.width), int(geo.depth)
        cms = cms.drop("width", "depth")
    else:  # legacy un-stamped sketch: width from the caller, depth inferred
        if width is None:
            raise ValueError(
                f"sketch at {sketch_path} has no width/depth stamp; pass width="
            )
        max_i = cms.agg(F.max("i")).first()[0]
        if max_i is None:
            raise ValueError(f"empty count-min sketch at {sketch_path}")
        depth = int(max_i) + 1
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
