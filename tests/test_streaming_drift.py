"""Live PSI drift monitor: per-epoch rows against the frozen training
reference (stable batch scores near 0, planted drift crosses the 0.25
retrain alarm), replayed epochs rewrite their own row (idempotent), and
the checkpoint restart resumes with no state."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from yamon_spark.streaming.drift import psi_epoch, start_psi_monitor

GOOD = "the quick brown fox jumps over a lazy dog in the field "
SOUP = "zzz xq qqq"


def _train(spark, tmp_path):
    from yamon_spark.operators.curation import quality_head_fit, score_histogram

    rows = [(i, GOOD * (2 + i % 4)) for i in range(60)]
    rows += [(100 + i, SOUP) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = quality_head_fit(docs, iters=12, lr=4.0)
    model.write.mode("overwrite").parquet(str(tmp_path / "model"))
    score_histogram(docs, model).write.mode("overwrite").parquet(str(tmp_path / "ref"))
    return docs


def _land(landing, name, docs):
    landing.mkdir(exist_ok=True)
    lines = [
        json.dumps(
            {"doc_id": i, "text": t, "lang": "en", "source": "s", "ts": "2024-05-01T10:00:00Z"}
        )
        for i, t in docs
    ]
    (landing / name).write_text("\n".join(lines) + "\n")


def _run(spark, tmp_path):
    q = start_psi_monitor(
        spark,
        str(tmp_path / "landing"),
        str(tmp_path / "model"),
        str(tmp_path / "ref"),
        str(tmp_path / "psi"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()


def test_psi_monitor_stable_then_drifted_epochs(spark, tmp_path):
    _train(spark, tmp_path)
    # epoch 0: same mix as training -> psi small
    _land(tmp_path / "landing", "b0.jsonl",
          [(i, GOOD * (2 + i % 4)) for i in range(30)] + [(200 + i, SOUP) for i in range(10)])
    _run(spark, tmp_path)
    # epoch 1 (restart resumes from checkpoint): all word-soup -> alarm
    _land(tmp_path / "landing", "b1.jsonl", [(500 + i, SOUP) for i in range(40)])
    _run(spark, tmp_path)

    rows = {int(r.ingest_epoch): r for r in spark.read.parquet(str(tmp_path / "psi")).collect()}
    assert sorted(rows) == [0, 1]
    assert rows[0].n_new == 40 and rows[1].n_new == 40
    assert rows[0].psi < 0.1  # stable band
    assert rows[1].psi > 0.25  # retrain alarm
    # zero state: each row depends only on its batch + the frozen reference
    assert rows[0].n_ref == rows[1].n_ref == 80


def test_psi_epoch_replay_is_idempotent(spark, tmp_path):
    docs = _train(spark, tmp_path)
    model = spark.read.parquet(str(tmp_path / "model"))
    ref = spark.read.parquet(str(tmp_path / "ref"))
    batch = docs.where(F.col("doc_id") < 30)
    psi_epoch(batch, model, ref, str(tmp_path / "psi"), epoch=7)
    first = spark.read.parquet(str(tmp_path / "psi")).collect()
    psi_epoch(batch, model, ref, str(tmp_path / "psi"), epoch=7)  # replay
    again = spark.read.parquet(str(tmp_path / "psi")).collect()
    assert len(first) == len(again) == 1
    assert first[0].asDict() == again[0].asDict()
