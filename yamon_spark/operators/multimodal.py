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
