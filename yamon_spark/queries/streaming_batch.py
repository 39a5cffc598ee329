"""Streaming semantics in batch-equivalent form (Q60-Q64).

The live Structured Streaming pipeline (yamon_spark.streaming) runs these
same shapes with readStream + withWatermark; here each is expressed over
the static events table so the DuckDB oracle can check it. FIXTURES.md
fixes the batch emulations (notably Q63's 1000-row micro-batch watermark
replay).

Scale: event-time windows group by (window, key) — partial agg applies;
session windows shuffle once by user; the watermark emulation is two
narrow passes + one broadcast join of per-batch watermarks (batch count
is tiny: rows/1000), with the running watermark computed by a
partitioned prefix-scan (prefix_max_exclusive) — no single-partition
window anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yamon_spark.queries import register, table

_Q60_AGG_SQL = """
    SELECT date_trunc('minute', ts) AS w, event_type,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM {src} GROUP BY 1, 2 ORDER BY 1, 2
"""


def prefix_max_exclusive(
    df: DataFrame, order_col: str, val_col: str, out_col: str, chunk_size: int = 1 << 20
) -> DataFrame:
    """Exclusive running max of `val_col` in `order_col` order, without a
    global (single-partition) window: the scalable prefix-scan idiom.

    out[k] = max(val[j] for j < k), NULL for the first row. Decomposition:
      - chunk = floor(order / chunk_size); within-chunk exclusive prefix max
        via a window PARTITIONED by chunk (<= chunk_size rows per task);
      - cross-chunk carry-in via a chunk-level non-equi self-join over the
        per-chunk maxima (rows/chunk_size rows: with the 2^20 default, a
        10^12-row input yields ~10^6/10^3 = ~10^3 chunk rows even when the
        input is itself a 1000x-reduced batch table — broadcastable).
    Requires order_col values to be unique (batch ids are).
    """
    chunked = df.withColumn("_pmx_chunk", F.floor(F.col(order_col) / chunk_size))
    w_in = (
        Window.partitionBy("_pmx_chunk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = chunked.withColumn("_pmx_in", F.max(val_col).over(w_in))
    cmax = chunked.groupBy("_pmx_chunk").agg(F.max(val_col).alias("_pmx_cmax"))
    prior = cmax.alias("a").join(
        F.broadcast(cmax.alias("b")),
        F.col("b._pmx_chunk") < F.col("a._pmx_chunk"),
        "left",
    )
    carry = prior.groupBy(F.col("a._pmx_chunk").alias("_pmx_chunk")).agg(
        F.max("b._pmx_cmax").alias("_pmx_carry")
    )
    return (
        within.join(F.broadcast(carry), "_pmx_chunk")
        # greatest() skips NULLs: NULL only when both sides are NULL,
        # i.e. the very first row — same as the global exclusive window.
        .withColumn(out_col, F.greatest("_pmx_in", "_pmx_carry"))
        .drop("_pmx_chunk", "_pmx_in", "_pmx_carry")
    )


def _tumbling_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("w"), "event_type", "n", "sum_value")
        .orderBy("w", "event_type")
    )


@register(
    "q60_tumbling_window",
    _Q60_AGG_SQL.format(src="events"),
    doc="Tumbling 1-minute count+sum per event_type (streaming: +withWatermark).",
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tumbling_agg(table(spark, sf_dir, "events"))


@register(
    "q61_sliding_window",
    """
    SELECT date_trunc('minute', ts) - (k * INTERVAL 1 MINUTE) AS w, event_type,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events CROSS JOIN (VALUES (0), (1), (2), (3), (4)) t(k)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Sliding window(5 min, slide 1 min): each event lands in 5 windows.",
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes", "1 minute").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("w"), "event_type", "n", "sum_value")
        .orderBy("w", "event_type")
    )


@register(
    "q62_session_window",
    """
    WITH d AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM d
    )
    SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end, count(*) AS n
    FROM s GROUP BY user_id, sid ORDER BY user_id, s_start
    """,
    doc=(
        "30-minute-gap sessions per user (audit-reassembly analogue, "
        "reference tail.go:17-44). Spark session_window end = last ts + gap."
    ),
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("win.start").alias("s_start"), F.col("win.end").alias("s_end"), "n")
        .orderBy("user_id", "s_start")
    )


@register(
    "q63_watermark_late_drop",
    """
    WITH ordered AS (
      SELECT *, CAST(floor((row_number() OVER (ORDER BY event_id) - 1) / 1000) AS BIGINT) AS batch_id
      FROM events
    ), batch_max AS (
      SELECT batch_id, max(ts) AS bmax FROM ordered GROUP BY batch_id
    ), wm AS (
      SELECT batch_id,
             max(bmax) OVER (ORDER BY batch_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               - INTERVAL 10 MINUTE AS watermark
      FROM batch_max
    ), survivors AS (
      SELECT o.* FROM ordered o JOIN wm USING (batch_id)
      WHERE wm.watermark IS NULL OR o.ts >= wm.watermark
    )
    SELECT date_trunc('minute', ts) AS w, event_type,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM survivors GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc=(
        "Late-data watermark emulation (FIXTURES.md): 1000-row micro-batches "
        "in event_id order; watermark = max(ts of prior batches) - 10 min; "
        "rows older than the watermark at arrival are dropped, then Q60."
    ),
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # event_id is dense 0..N-1 in every fixture (FIXTURES.md), so
    # row_number()-1 ordered by event_id IS event_id: the micro-batch id is
    # a pure projection, not a global (single-partition) window. The DuckDB
    # oracle keeps the row_number form;
    # tests/test_plans.py::test_q63_batch_id_projection_equals_window_form pins
    # projection == window-form equality on the fixtures.
    ordered = ev.withColumn(
        "batch_id",
        F.floor(F.col("event_id") / 1000).cast("bigint"),
    )
    batch_max = ordered.groupBy("batch_id").agg(F.max("ts").alias("bmax"))
    # exclusive running max of bmax over batch_id, via the partitioned
    # prefix-scan (no single-partition window; see prefix_max_exclusive)
    wm = prefix_max_exclusive(batch_max, "batch_id", "bmax", "_wm_max").select(
        "batch_id",
        (F.col("_wm_max") - F.expr("INTERVAL 10 MINUTE")).alias("watermark"),
    )
    survivors = ordered.join(F.broadcast(wm), "batch_id").where(
        F.col("watermark").isNull() | (F.col("ts") >= F.col("watermark"))
    )
    return _tumbling_agg(survivors)


@register(
    "q64_stateful_dedup",
    """
    SELECT event_id, ts, user_id, event_type, round(value, 4) AS value FROM (
      SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts, value) AS rn
      FROM events) t
    WHERE rn = 1 ORDER BY event_id
    """,
    doc=(
        "Dedup on event_id (streaming: dropDuplicatesWithinWatermark); batch "
        "form keeps the deterministic first row per id."
    ),
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_id").orderBy("ts", "value")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", F.round("value", 4).alias("value"))
        .orderBy("event_id")
    )
