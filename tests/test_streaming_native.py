"""Streaming-native execution of the declared streaming semantics
(SURVEY §5.2 'streaming tests'): the same aggregations that pass the
batch oracle (Q60/Q64) run through Structured Streaming file feeds and
produce the same results — exactly-once, watermarks, stateful dedup."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_events(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"e{len(list(path.iterdir()))}.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _tumbling(df):
    return (
        df.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    src = tmp_path / "events"
    rows = [
        {"event_id": i, "ts": f"2024-05-01T10:{m:02d}:{s:02d}", "event_type": t, "value": float(i)}
        for i, (m, s, t) in enumerate(
            [(0, 10, "a"), (0, 50, "a"), (0, 30, "b"), (1, 5, "a"), (2, 0, "b"), (2, 59, "b")]
        )
    ]
    _write_events(src, rows)

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    q = (
        _tumbling(stream)
        .writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in _tumbling(spark.read.schema(EVENT_SCHEMA).json(str(src))).collect()
    }
    streamed = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("select * from tumbling_out").collect()
    }
    assert streamed == batch and len(batch) == 4


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "events"
    _write_events(
        src,
        [
            {"event_id": 1, "ts": "2024-05-01T10:00:00", "event_type": "a", "value": 1.0},
            {"event_id": 1, "ts": "2024-05-01T10:00:20", "event_type": "a", "value": 1.0},  # dup
            {"event_id": 2, "ts": "2024-05-01T10:00:40", "event_type": "b", "value": 2.0},
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(["event_id"])
    seen: list[int] = []

    def run_once():
        q = (
            deduped.writeStream.foreachBatch(
                lambda b, _e: seen.extend(r.event_id for r in b.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # second run resumes dedup state from the checkpoint: a replayed id
    # within the watermark stays deduped across restarts
    _write_events(src, [{"event_id": 2, "ts": "2024-05-01T10:01:00", "event_type": "b", "value": 2.0}])
    run_once()
    assert sorted(seen) == [1, 2]


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    """Live stream-stream interval join (q65's shape): each error joins
    the same user's clicks from the preceding 30 minutes. Watermarks on
    both sides bound the join state; the time-range condition lets the
    engine expire click state once the error-side watermark passes."""
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
        ]
    )
    clicks_dir, errors_dir = tmp_path / "clicks", tmp_path / "errors"
    _write_events(
        clicks_dir,
        [
            {"event_id": 10, "ts": "2024-05-01T10:00:00", "user_id": 1},
            {"event_id": 11, "ts": "2024-05-01T10:20:00", "user_id": 1},
            {"event_id": 12, "ts": "2024-05-01T10:00:00", "user_id": 2},
        ],
    )
    _write_events(
        errors_dir,
        [
            {"event_id": 20, "ts": "2024-05-01T10:25:00", "user_id": 1},  # joins 10 and 11
            {"event_id": 21, "ts": "2024-05-01T11:00:00", "user_id": 2},  # click too old
        ],
    )

    def joined(clicks, errors):
        c, e = clicks.alias("c"), errors.alias("e")
        cond = (
            (F.col("e.user_id") == F.col("c.user_id"))
            & (F.col("c.ts") >= F.col("e.ts") - F.expr("INTERVAL 30 MINUTE"))
            & (F.col("c.ts") < F.col("e.ts"))
        )
        return e.join(c, cond, "inner").select(
            F.col("e.event_id").alias("error_id"), F.col("c.event_id").alias("click_id")
        )

    stream = joined(
        spark.readStream.schema(schema).json(str(clicks_dir)).withWatermark("ts", "1 hour"),
        spark.readStream.schema(schema).json(str(errors_dir)).withWatermark("ts", "1 hour"),
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("interval_join_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = {
        (r.error_id, r.click_id)
        for r in joined(
            spark.read.schema(schema).json(str(clicks_dir)),
            spark.read.schema(schema).json(str(errors_dir)),
        ).collect()
    }
    streamed = {
        (r.error_id, r.click_id) for r in spark.sql("select * from interval_join_out").collect()
    }
    assert streamed == batch == {(20, 10), (20, 11)}
