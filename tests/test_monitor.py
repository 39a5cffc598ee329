"""Self-metrics listener (SURVEY §2.6): engine progress events ->
ingestion counters -> metric rows."""

from __future__ import annotations

import time

from yamon_spark.streaming import monitor


def test_ingest_counters(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("r1\nr2\nr3\n")

    listener = monitor.attach(spark)
    try:
        q = (
            spark.readStream.text(str(src))
            .writeStream.format("noop")
            .queryName("ingest_probe")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and listener.rows_in.get("ingest_probe", 0) < 3:
            time.sleep(0.5)
        assert listener.rows_in.get("ingest_probe") == 3

        rows = listener.snapshot_metrics(spark).collect()
        byname = {r.name: r for r in rows}
        m = byname["yamon.ingested.ingest_probe"]
        assert m.value == 3.0
        assert m.tags == {"result": "read"}
        assert m.type == "counter"
    finally:
        spark.streams.removeListener(listener)
