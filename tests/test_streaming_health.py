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
