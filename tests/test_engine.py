"""Engine facade over pipeline-written tables: SQL access, tag filter,
time bucketing, counter delta/rate (SURVEY §7.1.3 query layer)."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from pyspark.sql import functions as F

from yamon_spark.engine import Engine, time_bucket
from yamon_spark.streaming import pipeline as P


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("engine")
    landing = tmp / "landing"
    landing.mkdir()
    metrics = []
    # two counter series + one gauge, 90s apart
    for i, ts in enumerate(["10:00:00", "10:01:30", "10:03:00"]):
        metrics.append({"t": f"2024-05-01T{ts}Z", "m": "counter", "h": "x", "n": "reqs", "v": 100.0 * (i + 1), "g": {"iface": "eth0"}})
    metrics.append({"t": "2024-05-01T10:04:30Z", "m": "counter", "h": "x", "n": "reqs", "v": 50.0, "g": {"iface": "eth0"}})  # reset
    metrics.append({"t": "2024-05-01T10:00:10Z", "m": "gauge", "h": "x", "n": "temp", "v": 36.6, "g": {}})
    (landing / "b.jsonl").write_text(json.dumps({"m": metrics, "l": [], "e": []}) + "\n")
    cfg = P.PipelineConfig(
        landing_dir=str(landing),
        out_dir=str(tmp / "out"),
        checkpoint_dir=str(tmp / "ckpt"),
        hostname="agent",
    )
    P.run_pipeline_once(spark, cfg)
    return Engine(spark, str(tmp / "out"))


def test_sql_over_views(spark, ingested):
    n = ingested.sql("SELECT count(*) AS n FROM metrics").collect()[0].n
    assert n == 5
    lts = ingested.sql("SELECT * FROM metrics_counter_lts ORDER BY value").collect()
    assert len(lts) >= 1


def test_tag_filter_uses_index_columns(spark, ingested):
    df = ingested.table("metrics")
    assert "tag_keys" in df.columns  # pipeline wrote the D7 index cols
    rows = Engine.tag_filter(df, "iface", "eth0").collect()
    assert len(rows) == 4 and all(r.tags["iface"] == "eth0" for r in rows)
    assert Engine.tag_filter(df, "iface", "lo").count() == 0
    assert Engine.tag_filter(df, "dc").count() == 0


def test_series_scan(spark, ingested):
    rows = ingested.series(name="reqs", host="agent", start="2024-05-01 10:01:00").collect()
    assert {r.value for r in rows} == {200.0, 300.0, 50.0}


def test_time_bucket(spark):
    df = spark.createDataFrame([("2024-05-01 10:03:59",)], "t string").select(
        F.col("t").cast("timestamp").alias("t")
    )
    got = df.select(time_bucket("t", 300).alias("b")).collect()[0].b
    assert got == dt.datetime(2024, 5, 1, 10, 0, 0)


def test_counter_delta_and_rate(spark, ingested):
    m = ingested.table("metrics").where(F.col("name") == "reqs")
    deltas = [r.delta for r in Engine.delta(m).orderBy("when").collect()]
    assert deltas == [None, 100.0, 100.0, 50.0]  # reset clamps to new value
    rates = [r.rate for r in Engine.rate(m).orderBy("when").collect()]
    assert rates[0] is None
    assert rates[1] == pytest.approx(100.0 / 90)
    assert rates[3] == pytest.approx(50.0 / 90)


def test_adhoc_rollup(spark, ingested):
    r = ingested.rollup("counter", 300).collect()
    assert len(r) == 1 and r[0].value == 650.0  # all four samples in one 5-min bucket
    g = ingested.rollup("gauge", 60).collect()
    assert len(g) == 1 and g[0].value == 36.6
