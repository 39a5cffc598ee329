"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB multimodal corpora: media lives in `binary` columns (or
pointers to object storage) beside typed metadata; decode / resize /
frame-sample run as Arrow-batched `mapInPandas` stages so bytes flow
Python-side once per batch, never per row. The actual codec calls are
STUBBED here (no image/audio libs in this container): `decode_stub=True`
substitutes a deterministic fake decoder so the Spark-side plumbing —
schema, batch iteration, partitioning — is real and tested;
`decode_stub=False` raises NotImplementedError where PIL/ffmpeg would be
invoked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sha string, width bigint, height bigint, n_frames bigint"
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 text bytes;
    in production: image/audio/video blobs or object-store pointers)."""
    return docs.select("doc_id", F.col("text").cast("binary").alias("payload"))


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video decoder: pretends the
    byte length encodes dimensions. Replace with PIL/pyav when available."""
    n = len(payload)
    return n % 640, (n * 7) % 480, n % 30


def decode_media(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """mapInPandas decode stage: binary payload -> typed metadata rows.

    Arrow moves each partition Python-side in columnar batches; the UDF
    is pure per-row compute, so the stage scales with input splits and
    adds zero shuffle.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/pyav; run with decode_stub=True"
                )
            payloads = pdf["payload"]
            dims = [_fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "sha": [hashlib.sha256(bytes(p)).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """End-to-end plumbing: attach binary -> mapInPandas decode -> metadata."""
    return decode_media(attach_binary(docs)).orderBy("doc_id")


RESIZED_SCHEMA = "doc_id bigint, payload binary, width bigint, height bigint"


def resize_media(media: DataFrame, target_w: int = 224, target_h: int = 224, decode_stub: bool = True) -> DataFrame:
    """mapInPandas resize stage: payload -> resized payload + dims.

    Stub codec: deterministic byte-subsampling to a size proportional to
    the target area (stands in for PIL's Image.resize; same Spark-side
    contract: binary in, binary out, no shuffle, Arrow-batched)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real resize requires PIL; run with decode_stub=True")
            outs = []
            for p in pdf["payload"]:
                b = bytes(p)
                step = max(1, len(b) * 100 // max(1, target_w * target_h // 64))
                outs.append(b[:: max(1, step // 100)])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": outs,
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                }
            )

    return media.mapInPandas(resize_batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx bigint, frame binary"


def sample_frames(media: DataFrame, every_n: int = 10, decode_stub: bool = True) -> DataFrame:
    """mapInPandas frame-sampling stage: one output row per sampled frame
    (a UDTF-shaped expansion — batches can grow). Stub codec treats each
    64-byte block as one 'frame' and keeps every n-th (stands in for
    pyav keyframe iteration)."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling requires pyav; run with decode_stub=True")
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = max(1, len(b) // 64)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * 64 : (i + 1) * 64])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(frame_batches, FRAMES_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, feature array<float>"


def extract_features(media: DataFrame, dim: int = 8, decode_stub: bool = True) -> DataFrame:
    """mapInPandas feature-extraction stage: payload -> fixed-dim float
    vector (stands in for a vision/audio encoder forward pass; on a real
    cluster this is where the GPU batch inference goes — Arrow batches
    map 1:1 onto model input batches). Stub: per-chunk byte means,
    deterministic."""
    import numpy as np

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real feature extraction requires a model runtime")
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                pad = (-len(arr)) % dim
                arr = np.pad(arr, (0, pad)).reshape(dim, -1)
                feats.append((arr.mean(axis=1) / 255.0).astype(np.float32))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media.mapInPandas(feature_batches, FEATURES_SCHEMA)
