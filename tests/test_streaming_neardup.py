"""Streaming near-dup triage (streaming/neardup.py): per-row signature
parity with the batch operators, cross-batch owner memory, and verdict
folding. Stateful emissions land in a parquet sink (the memory sink
cannot recover a checkpoint across query incarnations, and the
cross-batch test NEEDS a second incarnation on the same checkpoint —
same harness as the EWMA restart-durability test)."""

from __future__ import annotations

import json
import uuid

DOC_SCHEMA = "doc_id long, text string"


def test_rowwise_signatures_match_batch(spark):
    """The streaming-safe per-row array_min signatures must be
    bit-identical to the batch explode+groupBy minhash_signatures —
    otherwise live buckets and batch buckets silently diverge."""
    from yamon_spark.operators.dedup import minhash_signatures
    from yamon_spark.streaming.neardup import rowwise_signature_cols

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "pack my box with five dozen liquor jugs today"),
            (2, "one two"),  # shorter than the shingle width: tail contract
        ],
        DOC_SCHEMA,
    )
    row = {
        r.doc_id: [r[f"sig_{i}"] for i in range(16)]
        for r in docs.select(
            "doc_id", *rowwise_signature_cols(docs["text"], ngram=3, num_hashes=16)
        ).collect()
    }
    batch = {
        r.doc_id: [r[f"sig_{i}"] for i in range(16)]
        for r in minhash_signatures(docs, ngram=3, num_hashes=16).collect()
    }
    assert row == batch


def _land(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"b-{uuid.uuid4().hex}.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _drain(spark, flags, ckpt, out, expect_rows):
    """Run the stateful stream into a parquet sink (which, unlike the
    memory sink, supports restarting a NEW query incarnation on the same
    checkpoint) until ``expect_rows`` total rows have landed, then stop;
    return all rows landed so far.

    Poll-then-stop, NOT availableNow/processAllAvailable: with a 24 h
    processing-time TTL pending on every touched bucket, Spark keeps
    scheduling 'cleaning up state' batches back-to-back, so both
    quiescence-based drains block until the TTL fires — i.e. never in
    test time. The data batch itself commits within the first seconds."""
    import time

    q = (
        flags.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .option("path", str(out))
        .start()
    )
    deadline = time.time() + 120
    read = lambda: spark.read.schema(flags.schema).parquet(str(out))  # noqa: E731
    while time.time() < deadline:
        assert q.exception() is None
        try:
            if read().count() >= expect_rows:
                break
        except Exception:
            pass  # sink dir not created yet
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    rows = read().collect()
    assert len(rows) >= expect_rows, f"drain timed out: {len(rows)} < {expect_rows}"
    return rows


def test_near_dup_flags_cross_batch_memory(spark, tmp_path):
    """Doc 10 lands first and claims its buckets; a lightly-edited copy
    (doc 20) lands in a LATER run of the query and must be flagged near
    with owner 10 — state carried across runs via the checkpoint. An
    unrelated doc stays unique."""
    from yamon_spark.streaming.neardup import band_flags_to_verdicts, near_dup_flags_live

    src = tmp_path / "docs"
    base = "the quick brown fox jumps over the lazy dog again and again today"
    _land(src, [{"doc_id": 10, "text": base}])

    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    flags = near_dup_flags_live(stream)

    first = _drain(spark, flags, tmp_path / "ckpt", tmp_path / "out", expect_rows=4)
    v1 = band_flags_to_verdicts(spark.createDataFrame(first, flags.schema)).collect()
    assert [(r.doc_id, r.verdict) for r in v1] == [(10, "unique")]

    near = base.replace("today", "tonight")  # one word edited: bands still collide
    _land(
        src,
        [
            {"doc_id": 20, "text": near},
            {"doc_id": 30, "text": "completely different vocabulary in every single position here"},
        ],
    )
    # NEW query incarnation on the same checkpoint: doc 10's bucket
    # ownership must be remembered by the state store, not the batch.
    flags2 = near_dup_flags_live(spark.readStream.schema(DOC_SCHEMA).json(str(src)))
    both = _drain(spark, flags2, tmp_path / "ckpt", tmp_path / "out", expect_rows=12)
    got = {
        r.doc_id: r
        for r in band_flags_to_verdicts(spark.createDataFrame(both, flags.schema)).collect()
    }
    assert got[10].verdict == "unique"
    assert got[20].verdict == "near" and got[20].matched_id == 10
    assert got[20].n_bands_hit >= 1
    assert got[30].verdict == "unique" and got[30].matched_id is None


def test_exact_dup_hits_all_bands(spark, tmp_path):
    """A byte-identical copy shares every band: n_bands_hit == n_bands,
    and within one batch the lower doc_id owns the buckets."""
    from yamon_spark.streaming.neardup import band_flags_to_verdicts, near_dup_flags_live

    src = tmp_path / "docs"
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    _land(src, [{"doc_id": 1, "text": text}, {"doc_id": 2, "text": text}])

    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    flags = near_dup_flags_live(stream)
    rows = _drain(spark, flags, tmp_path / "ckpt", tmp_path / "out", expect_rows=8)
    got = {
        r.doc_id: r
        for r in band_flags_to_verdicts(spark.createDataFrame(rows, flags.schema)).collect()
    }
    assert got[1].verdict == "unique"
    assert got[2].verdict == "near"
    assert got[2].matched_id == 1
    assert got[2].n_bands_hit == 4


def test_hot_bucket_flood_state_bounded_and_evictions_observable(spark, tmp_path):
    """A flood of byte-identical docs hammers the SAME 4 band buckets:
    the state store must hold exactly n_bands rows (one owner long per
    bucket) no matter how many docs arrive — the TTL-bounded-state
    contract. After the 1 s TTL lapses, a later unrelated batch makes
    the timed-out buckets evict, and the monitor listener surfaces both
    observables (yamon.state.rows gauge, yamon.state.evicted counter)
    from the engine's own StateOperatorProgress."""
    import time

    from yamon_spark.streaming import monitor
    from yamon_spark.streaming.neardup import near_dup_flags_live

    listener = monitor.attach(spark)
    try:
        src = tmp_path / "docs"
        text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        _land(src, [{"doc_id": i, "text": text} for i in range(50)])  # hot flood

        stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
        flags = near_dup_flags_live(stream, state_ttl_s=1)
        q = (
            flags.writeStream.format("parquet")
            .outputMode("append")
            .queryName("neardup_flood")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .option("path", str(tmp_path / "out"))
            .start()
        )
        try:
            deadline = time.time() + 120
            read = lambda: spark.read.schema(flags.schema).parquet(str(tmp_path / "out"))  # noqa: E731
            while time.time() < deadline:
                assert q.exception() is None
                try:
                    if read().count() >= 200:  # 50 docs x 4 bands
                        break
                except Exception:
                    pass
                time.sleep(0.5)
            assert read().count() >= 200
            # state bounded by buckets, not docs: 4 bands x 1 hot bucket
            deadline = time.time() + 60
            while time.time() < deadline and listener.state_rows.get("neardup_flood", -1) != 4:
                time.sleep(0.5)
            assert listener.state_rows["neardup_flood"] == 4

            # TTL eviction: land an unrelated batch after the TTL lapsed;
            # the next micro-batch fires the timeouts and removes state
            time.sleep(1.5)
            _land(src, [{"doc_id": 999, "text": "totally different words everywhere now"}])
            deadline = time.time() + 60
            while time.time() < deadline and listener.state_evicted.get("neardup_flood", 0) < 4:
                time.sleep(0.5)
            assert listener.state_evicted["neardup_flood"] >= 4
        finally:
            q.stop()
            q.awaitTermination(60)

        snap = {
            r.name: r
            for r in listener.snapshot_metrics(spark).collect()
            if "state" in r.name
        }
        assert snap["yamon.state.evicted.neardup_flood"].value >= 4.0
        assert snap["yamon.state.evicted.neardup_flood"].type == "counter"
        # rows is the LATEST level per query, not an accumulation
        assert snap["yamon.state.rows.neardup_flood"].type == "gauge"
    finally:
        spark.streams.removeListener(listener)
