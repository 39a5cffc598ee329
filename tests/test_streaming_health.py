"""Live corpus-health monitor: per-epoch Gopher rule-failure slices, a
planted garbage flood visible as a rule-rate jump between epochs, and
replayed epochs rewriting their own partition (idempotent)."""

from __future__ import annotations

import json

from yamon_spark.streaming.corpus import parse_doc_lines
from yamon_spark.streaming.health import health_epoch, start_health_monitor

GOOD = "the quick brown fox jumps over a lazy dog in the field and night "
SOUP = "zzz xq qqq"  # no stopwords, 3 words -> word_count + stopword fails


def _land(landing, name, docs):
    landing.mkdir(exist_ok=True)
    lines = [
        json.dumps(
            {"doc_id": i, "text": t, "lang": "en", "source": "s", "ts": "2024-05-01T10:00:00Z"}
        )
        for i, t in docs
    ]
    (landing / name).write_text("\n".join(lines) + "\n")


def test_health_monitor_flags_garbage_flood_per_epoch(spark, tmp_path):
    from yamon_spark.operators.curation import GOPHER_RULES

    _land(tmp_path / "landing", "b0.jsonl", [(i, GOOD * 2) for i in range(20)])
    q = start_health_monitor(
        spark,
        str(tmp_path / "landing"),
        str(tmp_path / "health"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    # second epoch: half the batch is a garbage flood
    _land(
        tmp_path / "landing",
        "b1.jsonl",
        [(100 + i, GOOD * 2) for i in range(10)] + [(200 + i, SOUP) for i in range(10)],
    )
    q = start_health_monitor(
        spark,
        str(tmp_path / "landing"),
        str(tmp_path / "health"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    hist = spark.read.parquet(str(tmp_path / "health")).collect()
    assert {r.ingest_epoch for r in hist} == {0, 1}
    by_epoch = {(r.ingest_epoch, r.rule): r for r in hist}
    assert {r for e, r in by_epoch} == set(GOPHER_RULES)
    # epoch 0 clean; epoch 1's flood fires the stopword + word-count rules
    assert by_epoch[(0, "stopword_hits_low")].fail_frac == 0.0
    assert by_epoch[(1, "stopword_hits_low")].fail_frac == 0.5
    assert by_epoch[(1, "word_count_out_of_range")].n_fail == 10
    assert all(r.n_docs == 20 for r in hist)


def test_health_epoch_replay_is_idempotent(spark, tmp_path):
    _land(tmp_path / "landing", "b0.jsonl", [(i, GOOD * 2) for i in range(6)] + [(50, SOUP)])
    batch = parse_doc_lines(spark.read.text(str(tmp_path / "landing")))
    health_epoch(batch, str(tmp_path / "health"), epoch=3)
    first = sorted(
        (r.ingest_epoch, r.rule, r.n_fail, r.n_docs)
        for r in spark.read.parquet(str(tmp_path / "health")).collect()
    )
    health_epoch(batch, str(tmp_path / "health"), epoch=3)  # replay
    again = sorted(
        (r.ingest_epoch, r.rule, r.n_fail, r.n_docs)
        for r in spark.read.parquet(str(tmp_path / "health")).collect()
    )
    assert first == again
    assert len(first) == 5 and all(n == 7 for _, _, _, n in first)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )


def _hours(start_hour, n_hours, err_every):
    """10 events/hour; an 'error' every err_every-th event (0 = none)."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], start_hour * 10
    for h in range(start_hour, start_hour + n_hours):
        for m in range(10):
            et = "error" if err_every and m % err_every == 0 else "view"
            rows.append((eid, t0 + datetime.timedelta(hours=h, minutes=m), 1, et, 1.0, "{}"))
            eid += 1
    return rows


def test_burn_rate_monitor_matches_batch_and_replays_idempotently(spark, tmp_path):
    from yamon_spark.queries.analytics_ext4 import burn_rate_frame
    from yamon_spark.streaming.health import start_burn_rate_monitor

    landing = str(tmp_path / "events")
    out = str(tmp_path / "burn")
    episodes = str(tmp_path / "episodes")

    def run(ckpt):
        q = start_burn_rate_monitor(
            spark, landing, out, str(tmp_path / ckpt), episodes_path=episodes
        )
        q.awaitTermination()

    # epoch 1: block 0 (hours 0-5) at 50% errors -> every hour alerts
    _events(spark, _hours(0, 6, err_every=2)).coalesce(1).write.mode("append").parquet(landing)
    run("ck1")
    live = {r["ws"]: r for r in spark.read.parquet(out).collect()}
    assert len(live) == 6 and all(r["alert"] == 1 for r in live.values())

    # epoch 2: block 1 (hours 6-11) quiet -> new rows, no alert; block 0 intact
    _events(spark, _hours(6, 6, err_every=0)).coalesce(1).write.mode("append").parquet(landing)
    run("ck1")
    live = {r["ws"].hour: r for r in spark.read.parquet(out).collect()}
    assert len(live) == 12
    assert all(live[h]["alert"] == 1 for h in range(6))
    assert all(live[h]["alert"] == 0 for h in range(6, 12))

    # live table == the scheduled q90 frame over the same events (bit-identical)
    batch = {
        r["ws"]: r.asDict()
        for r in burn_rate_frame(spark.read.parquet(landing)).collect()
    }
    live_rows = {
        r["ws"]: {k: v for k, v in r.asDict().items() if k != "b6"}
        for r in spark.read.parquet(out).collect()
    }
    assert live_rows == batch

    # the live episodes table == the scheduled q91 rollup over the same
    # events (bit-identical: both run alert_episodes_frame over the same
    # burn frame)
    from yamon_spark.queries.analytics_ext4 import alert_episodes_frame

    batch_eps = [
        r.asDict()
        for r in alert_episodes_frame(
            burn_rate_frame(spark.read.parquet(landing))
        ).collect()
    ]
    live_eps = [
        r.asDict()
        for r in spark.read.parquet(episodes)
        .orderBy("episode_start")
        .collect()
    ]
    assert live_eps == batch_eps
    # one 6-hour alerting episode: block 0 alerts wall-to-wall, block 1 quiet
    assert len(live_eps) == 1 and live_eps[0]["n_hours"] == 6

    # replay from a fresh checkpoint: every epoch reprocessed -> same tables
    run("ck2")
    again = {
        r["ws"]: {k: v for k, v in r.asDict().items() if k != "b6"}
        for r in spark.read.parquet(out).collect()
    }
    assert again == batch
    again_eps = [
        r.asDict()
        for r in spark.read.parquet(episodes).orderBy("episode_start").collect()
    ]
    assert again_eps == batch_eps
