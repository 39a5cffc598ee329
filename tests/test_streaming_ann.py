"""Streaming IVF maintenance end-to-end: landed vector JSON lines ->
per-epoch idempotent cell-append into the persisted index, checkpoint
restart processes only new files, and the final index CONTENTS equal
the batch path (ivf_build + ivf_append over the same vectors)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from yamon_spark.streaming.ann import ivf_append_epoch, start_ivf_maintenance


def _land(landing, name, rows):
    landing.mkdir(exist_ok=True)
    (landing / name).write_text(
        "\n".join(json.dumps({"vec_id": i, "embedding": v}) for i, v in rows) + "\n"
    )


def _contents(spark, path):
    return {
        int(r.vec_id): (int(r.cell), tuple(round(float(x), 6) for x in r.embedding))
        for r in spark.read.parquet(path).collect()
    }


def _run(spark, tmp_path, idx, **kw):
    q = start_ivf_maintenance(
        spark, str(tmp_path / "landing"), idx, str(tmp_path / "ckpt"), **kw
    )
    q.awaitTermination()


def test_ivf_maintenance_restart_equals_batch_index(spark, tmp_path, sf_dir):
    """Two landings with a checkpoint restart in between: the streamed
    index holds exactly the vectors the batch path (ivf_build bootstrap
    + ivf_append delta) holds, cell-for-cell; the epoch log records one
    row per epoch with the recall gate firing on the 2nd epoch."""
    from yamon_spark.operators.similarity import ivf_append, ivf_build
    from yamon_spark.queries import table as load_table

    emb = load_table(spark, sf_dir, "embeddings")
    boot = emb.where("vec_id % 10 < 7").limit(200).cache()
    delta = emb.where("vec_id % 10 >= 7").limit(60).cache()

    # batch reference: quantizer fit on the bootstrap, delta appended
    batch_idx = str(tmp_path / "batch_ivf")
    ivf_build(boot, batch_idx, n_cells=4)
    ivf_append(delta, batch_idx)

    # streaming twin: same quantizer, vectors arrive as landed lines
    live_idx = str(tmp_path / "live_ivf")
    spark.read.parquet(batch_idx + "_centroids").write.parquet(live_idx + "_centroids")

    def lines(df):
        return [(int(r.vec_id), [float(x) for x in r.embedding]) for r in df.collect()]

    _land(tmp_path / "landing", "b1.jsonl", lines(boot))
    _run(spark, tmp_path, live_idx, recall_every=2, recall_embeddings=emb, recall_n_probe=4)
    _land(tmp_path / "landing", "b2.jsonl", lines(delta))
    _run(spark, tmp_path, live_idx, recall_every=2, recall_embeddings=emb, recall_n_probe=4)

    assert _contents(spark, live_idx) == _contents(spark, batch_idx)

    log = {int(r.ingest_epoch): r for r in spark.read.parquet(live_idx + "_epochlog").collect()}
    assert sorted(log) == [0, 1]
    assert log[0].n_rows == 200 and log[0].recall is None
    assert log[1].n_rows == 60
    assert log[1].recall == 1.0  # n_probe=4 over 4 cells is exhaustive
    boot.unpersist()
    delta.unpersist()


def test_ivf_append_epoch_replay_is_idempotent(spark, tmp_path, sf_dir):
    """A replayed foreachBatch epoch (same epoch id, same rows) leaves
    the index contents identical — dynamic partition overwrite rewrites
    only the epoch's own partitions, never appends duplicates — and the
    epoch log still has exactly one row for that epoch."""
    from yamon_spark.operators.similarity import ivf_build
    from yamon_spark.queries import table as load_table

    emb = load_table(spark, sf_dir, "embeddings")
    boot = emb.where("vec_id < 100")
    idx = str(tmp_path / "ivf")
    ivf_build(boot, idx + "_seed", n_cells=3)
    spark.read.parquet(idx + "_seed_centroids").write.parquet(idx + "_centroids")

    batch = emb.where("vec_id >= 100 and vec_id < 140").select("vec_id", "embedding")
    ivf_append_epoch(batch, idx, epoch=5)
    first = _contents(spark, idx)
    assert len(first) == 40
    ivf_append_epoch(batch, idx, epoch=5)  # replay
    assert _contents(spark, idx) == first
    log = spark.read.parquet(idx + "_epochlog").collect()
    assert len(log) == 1 and int(log[0].ingest_epoch) == 5 and log[0].n_rows == 40


def test_epochlog_cadence_reads_no_log_data(spark, tmp_path, sf_dir):
    """The streaming twin's drift-gate cadence counts epochs from the
    epochlog's partition directory names, never its rows: corrupting
    every parquet file in the log leaves subsequent epochs (and a replay
    of an old epoch) working. This is what bounds per-batch log IO at
    O(1) over the life of the stream."""
    from pathlib import Path

    from yamon_spark.operators.similarity import ivf_build
    from yamon_spark.queries import table as load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    ivf_build(emb.where("vec_id < 100"), idx + "_seed", n_cells=3)
    spark.read.parquet(idx + "_seed_centroids").write.parquet(idx + "_centroids")

    mk = lambda lo, hi: emb.where(f"vec_id >= {lo} and vec_id < {hi}").select(  # noqa: E731
        "vec_id", "embedding"
    )
    ivf_append_epoch(mk(100, 120), idx, epoch=1)
    ivf_append_epoch(mk(120, 140), idx, epoch=2)
    log_dir = Path(idx + "_epochlog")
    for f in log_dir.rglob("*.parquet"):
        f.write_bytes(b"not parquet")
    ivf_append_epoch(mk(140, 160), idx, epoch=3)  # must not read the garbage
    ivf_append_epoch(mk(120, 140), idx, epoch=2)  # replay of an old epoch too
    epochs = sorted(
        int(p.name.split("=", 1)[1]) for p in log_dir.iterdir() if p.name.startswith("ingest_epoch=")
    )
    assert epochs == [1, 2, 3]
