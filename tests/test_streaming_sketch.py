"""Live count-min sketch: streaming counters equal the batch operator's
counter table over the same docs (batch/stream parity), state stays
bounded at depth x width, checkpoint restart accumulates rather than
recounts, and persisted-sketch estimates keep the est >= exact
guarantee."""

from __future__ import annotations

import json
from collections import Counter

from yamon_spark.streaming.sketch import cms_estimate, start_count_min


def _land(landing, name, docs):
    landing.mkdir(exist_ok=True)
    (landing / name).write_text("\n".join(json.dumps(d) for d in docs) + "\n")


def _run(spark, tmp_path):
    q = start_count_min(
        spark,
        str(tmp_path / "landing"),
        str(tmp_path / "sketch"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()


def test_count_min_live_parity_restart_and_estimates(spark, tmp_path):
    from yamon_spark.operators.text import cms_counters

    base = {"lang": "en", "source": "s", "ts": "2024-05-01T10:00:00Z"}
    b1 = [dict(base, doc_id=1, text="alpha alpha beta gamma")]
    b2 = [dict(base, doc_id=2, text="alpha beta beta delta " + " ".join(f"t{i}" for i in range(20)))]
    _land(tmp_path / "landing", "b1.jsonl", b1)
    _run(spark, tmp_path)
    _land(tmp_path / "landing", "b2.jsonl", b2)
    _run(spark, tmp_path)  # restart: state resumes from checkpoint

    # parity: streamed counters == batch counter table over the union
    all_docs = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in b1 + b2], "doc_id long, text string"
    )
    batch = {(r.i, r.b): r.c for r in cms_counters(all_docs).collect()}
    live = {(r.i, r.b): r.c for r in spark.read.parquet(str(tmp_path / "sketch")).collect()}
    assert live == batch
    assert len(live) <= 4 * 64  # state bounded at depth x width

    # estimates from the persisted sketch: one-sided guarantee vs truth
    words = " ".join(d["text"] for d in b1 + b2).split()
    exact = Counter(words)
    est = {r.word: r.est_n for r in cms_estimate(spark, str(tmp_path / "sketch"), list(exact)).collect()}
    assert set(est) == set(exact)
    assert all(est[w] >= exact[w] for w in exact)
    assert est["alpha"] >= 3 and est["delta"] >= 1


def test_estimate_uses_stamped_geometry_not_caller_width(spark, tmp_path):
    """A sketch built with non-default width=16/depth=2 answers correctly
    with NO width argument (geometry read from the stamp); an empty
    sketch raises instead of crashing on a None depth."""
    import pytest

    base = {"lang": "en", "source": "s", "ts": "2024-05-01T10:00:00Z"}
    docs = [dict(base, doc_id=1, text="alpha alpha alpha beta")]
    _land(tmp_path / "landing", "b1.jsonl", docs)
    q = start_count_min(
        spark,
        str(tmp_path / "landing"),
        str(tmp_path / "sketch"),
        str(tmp_path / "ckpt"),
        width=16,
        depth=2,
    )
    q.awaitTermination()
    est = {r.word: r.est_n for r in cms_estimate(spark, str(tmp_path / "sketch"), ["alpha", "beta"]).collect()}
    assert est["alpha"] >= 3 and est["beta"] >= 1
    # width=16 sketch has no bucket above 15
    sk = spark.read.parquet(str(tmp_path / "sketch"))
    assert sk.agg({"b": "max"}).first()[0] < 16

    empty = str(tmp_path / "empty_sketch")
    sk.limit(0).write.parquet(empty)
    with pytest.raises(ValueError, match="empty count-min sketch"):
        cms_estimate(spark, empty, ["alpha"])
