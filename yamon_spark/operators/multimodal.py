"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB multimodal corpora: media lives in `binary` columns (or
pointers to object storage) beside typed metadata; decode / resize /
frame-sample run as Arrow-batched `mapInPandas` stages so bytes flow
Python-side once per batch, never per row.

Codec paths: `decode_stub=True` (default) substitutes a deterministic
fake decoder so the Spark-side plumbing — schema, batch iteration,
partitioning — is real and testable in any environment.
`decode_stub=False` uses Pillow (imported lazily on the executor, so
only worker environments need it); when Pillow is absent it raises
NotImplementedError with the dependency named. Video frame iteration
beyond Pillow's multi-frame formats (GIF/TIFF) would need pyav and
stays stubbed.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pil_image():
    """Lazy executor-side Pillow import for the real codec paths."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError as e:  # pragma: no cover - exercised only sans PIL
        raise NotImplementedError(
            "real media decoding requires Pillow on the executors; "
            "install it or run with decode_stub=True"
        ) from e


def _pyav():
    """Lazy executor-side pyav import for video-container frame decode
    (same pattern as _pil_image: only worker environments need the lib,
    and stub mode keeps the Spark-side plumbing testable without it)."""
    try:
        import av  # noqa: PLC0415

        return av
    except ImportError as e:  # pragma: no cover - exercised only sans pyav
        raise NotImplementedError(
            "video frame decoding requires pyav on the executors; "
            "install it or run with decode_stub=True"
        ) from e

def decode_bmp(b: bytes) -> tuple[int, int, int]:
    """Vendored minimal BMP decoder (pure stdlib): dimensions of an
    uncompressed Windows bitmap, from the public BITMAPFILEHEADER /
    BITMAPINFOHEADER / BITMAPCOREHEADER layouts. One REAL container
    format the codec path can exercise in any environment — Pillow-less
    CI included — rather than trusting the stub for everything.

    Returns (width, height, n_frames=1); raises ValueError on anything
    that is not a well-formed uncompressed BMP."""
    import struct

    if len(b) < 26 or b[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    file_size, pixel_off = struct.unpack_from("<I4xI", b, 2)
    if file_size != len(b):
        raise ValueError(f"BMP header size {file_size} != payload size {len(b)}")
    (dib_size,) = struct.unpack_from("<I", b, 14)
    if dib_size == 12:  # BITMAPCOREHEADER: u16 dims, always uncompressed
        width, height, _planes, bpp = struct.unpack_from("<HHHH", b, 18)
    elif dib_size >= 40:  # BITMAPINFOHEADER and extensions: i32 dims
        if len(b) < 14 + 40:
            raise ValueError("truncated BITMAPINFOHEADER")
        width, height, _planes, bpp, compression = struct.unpack_from("<iiHHI", b, 18)
        if compression != 0:  # BI_RGB only — this decoder is 'uncompressed'
            raise ValueError(f"unsupported BMP compression {compression}")
        height = abs(height)  # negative = top-down row order, same dims
    else:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    if width <= 0 or height <= 0 or bpp not in (1, 4, 8, 16, 24, 32):
        raise ValueError(f"implausible BMP geometry {width}x{height}@{bpp}bpp")
    row_bytes = (width * bpp + 31) // 32 * 4  # rows pad to 4-byte boundaries
    if pixel_off + row_bytes * height > len(b):
        raise ValueError("BMP pixel array extends past payload")
    return width, height, 1


def decode_png(b: bytes) -> tuple[int, int, int]:
    """Vendored minimal PNG decoder (pure stdlib): 8-bit grayscale,
    non-interlaced. Walks the chunk stream verifying every CRC, inflates
    the concatenated IDAT zlib stream, and UNFILTERS each scanline per
    the PNG spec (all five filter types: None/Sub/Up/Average/Paeth) —
    the first vendored codec here that decodes a genuinely COMPRESSED
    container, not just a header walk. Public format: RFC 2083 /
    W3C PNG spec; layout knowledge only, no code taken from anywhere.

    Returns (width, height, pixel_sum) where pixel_sum is the exact
    integer sum of all reconstructed pixel bytes — the value the oracle
    recomputes arithmetically, so a hash match proves inflate+unfilter
    reproduced every pixel. Raises ValueError on malformed input."""
    import struct
    import zlib

    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    off, width, height, idat, seen_iend = 8, None, None, b"", False
    while off + 12 <= len(b):
        length, ctype = struct.unpack_from(">I4s", b, off)
        if off + 12 + length > len(b):
            raise ValueError("PNG chunk extends past payload")
        data = b[off + 8 : off + 8 + length]
        (crc,) = struct.unpack_from(">I", b, off + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            if length != 13:  # else struct.unpack raises struct.error,
                # escaping the ValueError-only decoder contract
                raise ValueError("PNG IHDR must be 13 bytes")
            width, height, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if (depth, color, comp, filt, inter) != (8, 0, 0, 0, 0):
                raise ValueError("only 8-bit grayscale non-interlaced PNG supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
        off += 12 + length
    if width is None or not seen_iend or off != len(b):
        raise ValueError("PNG missing IHDR/IEND or trailing garbage")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        # normalize to the decoder contract: EVERY malformed input raises
        # ValueError, so decode_media's Pillow fallback (which catches
        # ValueError only) is reachable for corrupt-deflate payloads too
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    if len(raw) != (width + 1) * height:
        raise ValueError("PNG scanline data has wrong length")
    prev, total = bytearray(width), 0
    for y in range(height):
        base = y * (width + 1)
        ftype, row = raw[base], bytearray(raw[base + 1 : base + 1 + width])
        if ftype == 1:  # Sub
            for x in range(1, width):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(width):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(width):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(width):
                a, up, c = row[x - 1] if x else 0, prev[x], prev[x - 1] if x else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        total += sum(row)
        prev = row
    return width, height, total


def encode_png(width: int, height: int, pix: bytes) -> bytes:
    """Build a real 8-bit grayscale PNG (encode half of decode_png).
    The per-row filter type cycles 0..4, so every round-tripped image
    with height >= 5 forces the decoder through ALL five unfilter paths
    — the compression and filtering are genuine, not a degenerate
    filter-0-only stream."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw, prev = bytearray(), bytes(width)
    for y in range(height):
        row = pix[y * width : (y + 1) * width]
        f = y % 5
        raw.append(f)
        if f == 0:
            raw += row
        elif f == 1:  # Sub
            raw += bytes((row[x] - (row[x - 1] if x else 0)) & 0xFF for x in range(width))
        elif f == 2:  # Up
            raw += bytes((row[x] - prev[x]) & 0xFF for x in range(width))
        elif f == 3:  # Average
            raw += bytes(
                (row[x] - (((row[x - 1] if x else 0) + prev[x]) // 2)) & 0xFF
                for x in range(width)
            )
        else:  # Paeth
            for x in range(width):
                a, up, c = row[x - 1] if x else 0, prev[x], prev[x - 1] if x else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                raw.append((row[x] - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


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
        import io

        for pdf in batches:
            # one bytes() materialization per payload: each call copies the
            # whole blob, and this is the hot Arrow path for large media
            bs = [bytes(p) for p in pdf["payload"]]
            if decode_stub:
                dims = [_fake_decode(b) for b in bs]
            else:
                def pil_dims(b: bytes):
                    with _pil_image().open(io.BytesIO(b)) as img:
                        return (img.width, img.height, getattr(img, "n_frames", 1))

                dims = []
                for b in bs:
                    if b[:8] == b"\x89PNG\r\n\x1a\n":
                        # vendored compressed-codec path (grayscale-8); other
                        # color types/depths fall through to Pillow
                        try:
                            w, h, _pixel_sum = decode_png(b)
                            dims.append((w, h, 1))
                            continue
                        except ValueError:
                            pass
                    if b[:2] == b"\xff\xd8":
                        # vendored baseline decoder (SOF0 grayscale);
                        # progressive/subsampled/color fall through to
                        # Pillow rather than failing the batch
                        try:
                            w, h, _pix = decode_jpeg(b)
                            dims.append((w, h, 1))
                            continue
                        except ValueError:
                            pass
                    if b[:2] == b"BM":
                        # vendored real codec first (no Pillow needed), but
                        # it covers uncompressed BMP only — fall back to
                        # Pillow for variants it rejects (BI_BITFIELDS,
                        # wrong bfSize, ...) rather than aborting the whole
                        # job on one unusual-but-valid payload
                        try:
                            dims.append(decode_bmp(b))
                            continue
                        except ValueError:
                            pass
                    dims.append(pil_dims(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in bs],
                    "sha": [hashlib.sha256(b).hexdigest() for b in bs],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def multimodal_meta(docs: DataFrame) -> DataFrame:
    """End-to-end plumbing: attach binary -> mapInPandas decode -> metadata."""
    return decode_media(attach_binary(docs)).orderBy("doc_id")


def encode_bmp(width: int, height: int, bpp: int = 24) -> bytes:
    """Build a valid uncompressed BITMAPINFOHEADER BMP with zeroed
    pixels — the encode half of the vendored codec (test fixtures and
    the oracle-gated round-trip below)."""
    import struct

    row = (width * bpp + 31) // 32 * 4
    pixels = b"\x00" * (row * height)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + len(dib) + len(pixels), 0, 0, 14 + len(dib))
    return header + dib + pixels


def encode_avi(width: int, height: int, frames: list[bytes]) -> bytes:
    """Build a minimal uncompressed RIFF/AVI container (encode half of
    demux_avi): hdrl LIST with an avih main header, movi LIST with one
    '00db' chunk per frame, even-offset padding."""
    import struct

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")

    avih = bytearray(56)
    struct.pack_into("<I", avih, 16, len(frames))  # dwTotalFrames
    struct.pack_into("<II", avih, 32, width, height)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", bytes(avih)))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


BMP_ROUNDTRIP_SCHEMA = "doc_id bigint, width bigint, height bigint, n_bytes bigint"


def bmp_roundtrip(docs: DataFrame) -> DataFrame:
    """REAL-codec round-trip under the oracle gate: per doc, derive dims
    deterministically, encode an actual uncompressed BMP, then recover
    width/height/size by DECODING the bytes with the vendored decoder
    (decode_media's real branch). The emitted values exist only if real
    container bytes parsed correctly — so the driver's hash compare
    exercises a genuine image codec path, not the stub (closes the r4
    'the oracle verifies the stub' caveat for images). Shuffle-free
    Arrow mapInPandas, same batch shape as every decode stage."""

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, ns = [], [], [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                b = encode_bmp(int(n_chars) % 13 + 1, int(doc_id) % 7 + 1)
                w, h, _ = decode_bmp(b)
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                ns.append(len(b))
            yield pd.DataFrame({"doc_id": ids, "width": ws, "height": hs, "n_bytes": ns})

    return (
        docs.select("doc_id", "n_chars")
        .mapInPandas(roundtrip, BMP_ROUNDTRIP_SCHEMA)
        .orderBy("doc_id")
    )


PNG_ROUNDTRIP_SCHEMA = "doc_id bigint, width bigint, height bigint, pixel_sum bigint"


def png_roundtrip(docs: DataFrame) -> DataFrame:
    """COMPRESSED-codec round-trip under the oracle gate: per doc, derive
    dims and a deterministic grayscale pattern, encode a real PNG
    (zlib-deflated scanlines, filter types cycling 0-4), then recover
    width/height/exact-pixel-sum by fully DECODING it — CRC checks,
    inflate, and all five PNG unfilter paths. The oracle recomputes the
    pixel sum arithmetically from the pattern, so a hash match proves
    the decompression+reconstruction pipeline is bit-exact. This is the
    piece the BMP/WAV/AVI trio lacked: those verify container parsing;
    this verifies a real compressed bitstream (every production image
    format is compressed). Shuffle-free Arrow mapInPandas."""

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, sums = [], [], [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                d, w, h = int(doc_id), int(n_chars) % 13 + 1, int(doc_id) % 7 + 1
                pix = bytes((d * 31 + y * w + x * 7) % 256 for y in range(h) for x in range(w))
                w2, h2, pixel_sum = decode_png(encode_png(w, h, pix))
                ids.append(doc_id)
                ws.append(w2)
                hs.append(h2)
                sums.append(pixel_sum)
            yield pd.DataFrame({"doc_id": ids, "width": ws, "height": hs, "pixel_sum": sums})

    return (
        docs.select("doc_id", "n_chars")
        .mapInPandas(roundtrip, PNG_ROUNDTRIP_SCHEMA)
        .orderBy("doc_id")
    )


WAV_ROUNDTRIP_SCHEMA = "doc_id bigint, n_samples bigint, sample_sum bigint, n_bytes bigint"


def wav_roundtrip(docs: DataFrame) -> DataFrame:
    """Audio twin of :func:`bmp_roundtrip`: synthesize a deterministic
    PCM16 signal per doc, container it as a REAL WAV via stdlib
    ``wave``, parse it back through the same module (the
    ``audio_windows`` real-codec branch), emit the recovered sample
    count, exact integer sample sum, and container size. Values are
    reachable only by correctly writing AND parsing the RIFF/WAVE
    layout; integer sums keep the oracle comparison exact."""

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_samples", "sample_sum", "n_bytes")}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                n = int(n_chars) % 50 + 1
                samples = [((int(doc_id) * 37 + k * 11) % 2001) - 1000 for k in range(n)]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(16000)
                    wf.writeframes(struct.pack(f"<{n}h", *samples))
                b = buf.getvalue()
                with wave.open(io.BytesIO(b)) as rf:
                    back = struct.unpack(f"<{rf.getnframes()}h", rf.readframes(rf.getnframes()))
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(back))
                out["sample_sum"].append(sum(back))
                out["n_bytes"].append(len(b))
            yield pd.DataFrame(out)

    return (
        docs.select("doc_id", "n_chars")
        .mapInPandas(roundtrip, WAV_ROUNDTRIP_SCHEMA)
        .orderBy("doc_id")
    )


AVI_ROUNDTRIP_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_frames bigint, "
    "frame_bytes bigint, n_bytes bigint"
)


def avi_roundtrip(docs: DataFrame) -> DataFrame:
    """Video twin of :func:`bmp_roundtrip`: encode a real uncompressed
    AVI per doc (dims/frame count/frame size derived from doc fields),
    demux it back with the vendored demuxer, emit recovered dims, frame
    count, decoded frame byte total and container size — all only
    reachable by genuinely parsing RIFF chunk structure, so the driver
    oracle hash-verifies the real video-container path."""

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "n_frames", "frame_bytes", "n_bytes")}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                nf = int(doc_id) % 4 + 1
                flen = int(n_chars) % 9 + 1
                b = encode_avi(int(n_chars) % 13 + 1, int(doc_id) % 7 + 1, [b"\x00" * flen] * nf)
                w, h, frames = demux_avi(b)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["frame_bytes"].append(sum(len(f) for f in frames))
                out["n_bytes"].append(len(b))
            yield pd.DataFrame(out)

    return (
        docs.select("doc_id", "n_chars")
        .mapInPandas(roundtrip, AVI_ROUNDTRIP_SCHEMA)
        .orderBy("doc_id")
    )


RESIZED_SCHEMA = "doc_id bigint, payload binary, width bigint, height bigint"


def resize_media(media: DataFrame, target_w: int = 224, target_h: int = 224, decode_stub: bool = True) -> DataFrame:
    """mapInPandas resize stage: payload -> resized payload + dims.

    Stub codec: deterministic byte-subsampling to a size proportional to
    the target area. Real codec: Pillow decode -> Image.resize ->
    re-encoded PNG bytes. Same Spark-side contract either way: binary
    in, binary out, no shuffle, Arrow-batched."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = None if decode_stub else _pil_image()
        for pdf in batches:
            outs = []
            for p in pdf["payload"]:
                b = bytes(p)
                if decode_stub:
                    step = max(1, len(b) * 100 // max(1, target_w * target_h // 64))
                    outs.append(b[:: max(1, step // 100)])
                else:
                    with Image.open(io.BytesIO(b)) as img:
                        buf = io.BytesIO()
                        img.resize((target_w, target_h)).save(buf, format="PNG")
                        outs.append(buf.getvalue())
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
    64-byte block as one 'frame' and keeps every n-th. Real codec:
    Pillow multi-frame iteration (GIF/TIFF seek), each kept frame
    re-encoded as PNG; general video containers would need pyav."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = None if decode_stub else _pil_image()
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                if decode_stub:
                    n_frames = max(1, len(b) // 64)
                    for i in range(0, n_frames, every_n):
                        ids.append(doc_id)
                        idxs.append(i)
                        frames.append(b[i * 64 : (i + 1) * 64])
                else:
                    with Image.open(io.BytesIO(b)) as img:
                        for i in range(0, getattr(img, "n_frames", 1), every_n):
                            img.seek(i)
                            buf = io.BytesIO()
                            img.convert("RGB").save(buf, format="PNG")
                            ids.append(doc_id)
                            idxs.append(i)
                            frames.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(frame_batches, FRAMES_SCHEMA)


def _try_demux_avi(b: bytes):
    """demux_avi, or None when the container is outside the vendored
    demuxer's coverage (compressed streams etc.) — the caller then falls
    through to pyav instead of aborting the job on one real-world AVI."""
    try:
        return demux_avi(b)
    except ValueError:
        return None


def demux_avi(b: bytes) -> tuple[int, int, list[bytes]]:
    """Vendored minimal AVI demuxer (pure stdlib): frame dims + raw
    uncompressed frame chunks from the public RIFF/AVI layout ('RIFF'
    size 'AVI ', nested LIST chunks, 'avih' main header with dwWidth/
    dwHeight at offsets 32/36, '..db' uncompressed frame chunks inside
    the 'movi' LIST, chunks padded to even offsets). Completes the
    real-codec trio — BMP (image), WAV (audio), AVI (video) — that runs
    with no third-party library, so the container path is exercised in
    CI rather than trusted to the stub.

    Returns (width, height, [frame_bytes...]); raises ValueError on
    malformed input or compressed ('..dc') streams."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/'AVI ' magic")
    dims: list[tuple[int, int]] = []
    frames: list[bytes] = []

    def walk(off: int, end: int) -> None:
        while off + 8 <= end:
            fourcc = b[off : off + 4]
            (size,) = struct.unpack_from("<I", b, off + 4)
            data_off = off + 8
            if data_off + size > len(b):
                raise ValueError("AVI chunk extends past payload")
            if fourcc == b"LIST":
                walk(data_off + 4, data_off + size)
            elif fourcc == b"avih":
                if size < 40:
                    raise ValueError("truncated avih header")
                dims.append(struct.unpack_from("<II", b, data_off + 32))
            elif fourcc[2:4] == b"db":  # uncompressed DIB frame
                frames.append(b[data_off : data_off + size])
            elif fourcc[2:4] == b"dc":
                raise ValueError(
                    "compressed AVI stream; the vendored demuxer handles "
                    "uncompressed ('..db') frames — use pyav for codecs"
                )
            off = data_off + size + (size & 1)  # chunks pad to even offsets

    walk(12, len(b))
    if not dims:
        raise ValueError("AVI missing avih main header")
    width, height = dims[0]
    if width <= 0 or height <= 0:
        raise ValueError(f"implausible AVI dims {width}x{height}")
    return width, height, frames


VIDEO_FRAMES_SCHEMA = "doc_id bigint, frame_idx bigint, width bigint, height bigint, frame binary"


def sample_video_frames(media: DataFrame, every_n: int = 10, decode_stub: bool = True) -> DataFrame:
    """mapInPandas video frame-sampling: container bytes -> every n-th
    decoded frame as PNG, with per-frame dims (one output row per frame —
    the same UDTF-shaped expansion as sample_frames, but through a real
    video demuxer). Real codec: pyav (lazy executor import) demuxes the
    container's first video stream and re-encodes kept frames via Pillow.
    Stub codec: each 256-byte block is one 'frame' whose fake dims derive
    from the block bytes — deterministic, environment-free plumbing."""

    def video_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            ids, idxs, ws, hs, frames = [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                if decode_stub:
                    n_frames = max(1, len(b) // 256)
                    for i in range(0, n_frames, every_n):
                        blk = b[i * 256 : (i + 1) * 256]
                        ids.append(doc_id)
                        idxs.append(i)
                        ws.append(16 + (sum(blk[:4]) % 64) if blk else 16)
                        hs.append(16 + (sum(blk[4:8]) % 64) if len(blk) > 4 else 16)
                        frames.append(blk)
                elif b[:4] == b"RIFF" and b[8:12] == b"AVI " and (raw_avi := _try_demux_avi(b)):
                    # vendored real demuxer (uncompressed AVI, no pyav
                    # needed); a compressed AVI falls through to pyav below
                    w, h, raw = raw_avi
                    for i in range(0, len(raw), every_n):
                        ids.append(doc_id)
                        idxs.append(i)
                        ws.append(w)
                        hs.append(h)
                        frames.append(raw[i])
                else:  # pragma: no cover - needs pyav on the executors
                    av = _pyav()
                    _pil_image()  # frame.to_image() needs Pillow; named dep
                    with av.open(io.BytesIO(b)) as container:
                        for i, frame in enumerate(container.decode(video=0)):
                            if i % every_n:
                                continue
                            img = frame.to_image()
                            buf = io.BytesIO()
                            img.save(buf, format="PNG")
                            ids.append(doc_id)
                            idxs.append(i)
                            ws.append(img.width)
                            hs.append(img.height)
                            frames.append(buf.getvalue())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "width": ws, "height": hs, "frame": frames}
            )

    return media.mapInPandas(video_batches, VIDEO_FRAMES_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, feature array<float>"


def extract_features(media: DataFrame, dim: int = 8, decode_stub: bool = True) -> DataFrame:
    """mapInPandas feature-extraction stage: payload -> fixed-dim float
    vector (stands in for a vision/audio encoder forward pass; on a real
    cluster this is where the GPU batch inference goes — Arrow batches
    map 1:1 onto model input batches). Stub: per-chunk byte means over
    the raw payload. Real: Pillow decode -> grayscale pixel array, then
    the same per-chunk means — a deterministic stand-in encoder whose
    forward pass a model runtime would replace."""
    import numpy as np

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = None if decode_stub else _pil_image()

        def chunk_means(arr: "np.ndarray") -> "np.ndarray":
            if arr.size == 0:  # empty payload: zero vector, not NaN (mean of nothing)
                return np.zeros(dim, dtype=np.float32)
            pad = (-len(arr)) % dim
            arr = np.pad(arr, (0, pad)).reshape(dim, -1)
            return (arr.mean(axis=1) / 255.0).astype(np.float32)

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if decode_stub:
                    arr = np.frombuffer(bytes(p), dtype=np.uint8)
                else:
                    with Image.open(io.BytesIO(bytes(p))) as img:
                        arr = np.asarray(img.convert("L"), dtype=np.uint8).ravel()
                feats.append(chunk_means(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media.mapInPandas(feature_batches, FEATURES_SCHEMA)


AUDIO_WINDOWS_SCHEMA = "doc_id bigint, win_idx bigint, n_samples bigint, rms double"


def audio_windows(
    media: DataFrame, win: int = 400, hop: int = 160, decode_stub: bool = True
) -> DataFrame:
    """mapInPandas audio framing: payload -> per-window RMS energy (the
    front end of any audio featurizer — VAD, loudness normalization,
    MFCC all start from framed energy). One output row per analysis
    window (win samples every hop), plus the decoded sample count.

    Real codec: stdlib ``wave`` parses WAV containers (16-bit PCM mono)
    — no third-party dependency, so the real path runs anywhere. Stub
    codec: the raw payload bytes are interpreted as little-endian PCM16
    directly; deterministic and container-free, exercising the same
    framing math. RMS rounds to 4dp (engine-parity convention)."""
    import numpy as np

    def window_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            ids, idxs, counts, rmss = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                if decode_stub:
                    pcm = b[: len(b) - (len(b) % 2)]
                else:
                    with wave.open(io.BytesIO(b)) as wf:
                        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
                            raise NotImplementedError(
                                "real audio decoding supports 16-bit PCM mono WAV; "
                                "other formats need a codec lib or decode_stub=True"
                            )
                        pcm = wf.readframes(wf.getnframes())
                samples = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
                n = len(samples)
                n_wins = max(1, (n - win) // hop + 1) if n >= win else 1
                for i in range(n_wins):
                    chunk = samples[i * hop : i * hop + win]
                    rms = float(np.sqrt(np.mean(chunk * chunk))) if len(chunk) else 0.0
                    ids.append(doc_id)
                    idxs.append(i)
                    counts.append(n)
                    # half-away-from-zero, matching DuckDB/Spark ROUND ties
                    # (Python round() is half-even — a third convention)
                    rmss.append(math.floor(rms * 1e4 + 0.5) / 1e4)
            yield pd.DataFrame(
                {"doc_id": ids, "win_idx": idxs, "n_samples": counts, "rms": rmss}
            )

    return media.mapInPandas(window_batches, AUDIO_WINDOWS_SCHEMA)


# --- vendored baseline JPEG (ITU T.81 / JFIF, public spec) -------------
#
# SOF0 8-bit grayscale, no subsampling: the last production codec gap.
# decode_jpeg runs the full general baseline path — marker walk, DQT /
# DHT parsing with canonical Huffman reconstruction, byte-unstuffed bit
# reading, DC prediction, ZRL/EOB run-length decode, dequantization,
# de-zigzag, full 2-D IDCT, level shift + clamp + edge crop. encode_jpeg
# is the fixture half: it entropy-codes caller-supplied QUANTIZED
# coefficients (no FDCT — the roundtrip query constructs images in the
# coefficient domain so the lossy transform is exactly invertible and
# the oracle can recompute pixel statistics arithmetically).
# Layout knowledge only (ITU T.81 Annex B/C/F, Annex K tables); no code
# taken from anywhere.

# zigzag index -> raster index, generated (not typed) from the diagonal
# rule: even-sum diagonals walk row-descending, odd-sum row-ascending
JPEG_ZIGZAG = [
    8 * r + c
    for s in range(15)
    for r, c in (
        [(s - c, c) for c in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0
        else [(r, s - r) for r in range(max(0, s - 7), min(s, 7) + 1)]
    )
]

# Annex K: standard luminance Huffman table specs (BITS, HUFFVAL)
JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
JPEG_DC_VALS = tuple(range(12))
JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
JPEG_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _jpeg_huff_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """Canonical Huffman construction (T.81 C.2): symbol -> (code, length)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code, k = code + 1, k + 1
        code <<= 1
    return table


def _jpeg_extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` received bits to a signed value."""
    return v if v >= 1 << (size - 1) else v - (1 << size) + 1


class _JpegBitWriter:
    """MSB-first bit emitter with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self):
        self.out, self.acc, self.nbits = bytearray(), 0, 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1-bits per spec
        return bytes(self.out)


def encode_jpeg(width: int, height: int, blocks: list[list[int]], qt: list[int]) -> bytes:
    """Entropy-code quantized coefficient blocks into a real baseline
    JPEG: SOI, DQT, SOF0 (8-bit, 1 component, 1x1 sampling), two DHT
    segments carrying the Annex K luminance tables, SOS, the
    Huffman-coded scan (DC prediction, ZRL runs, EOB), EOI.

    `blocks`: one 64-entry list per 8x8 block in raster block order,
    coefficients in ZIGZAG order, already quantized. `qt`: 64 quant
    values in zigzag order (1..255)."""
    import struct

    dc_tab = _jpeg_huff_encode_table(JPEG_DC_BITS, JPEG_DC_VALS)
    ac_tab = _jpeg_huff_encode_table(JPEG_AC_BITS, JPEG_AC_VALS)
    w = _JpegBitWriter()
    pred = 0
    for blk in blocks:
        diff = blk[0] - pred
        pred = blk[0]
        size = diff.bit_length() if diff else 0
        w.put(*dc_tab[size])
        if size:
            w.put(diff if diff > 0 else diff + (1 << size) - 1, size)
        run = 0
        for k in range(1, 64):
            v = blk[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                w.put(*ac_tab[0xF0])  # ZRL: 16 zeros
                run -= 16
            size = abs(v).bit_length()
            w.put(*ac_tab[(run << 4) | size])
            w.put(v if v > 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            w.put(*ac_tab[0x00])  # EOB

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(qt))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(JPEG_DC_BITS) + bytes(JPEG_DC_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(JPEG_AC_BITS) + bytes(JPEG_AC_VALS)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + w.flush() + b"\xff\xd9"


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded scan: un-stuffs
    0xFF 0x00, stops at any real marker (EOI terminates the scan)."""

    def __init__(self, b: bytes, off: int):
        self.b, self.off, self.acc, self.nbits = b, off, 0, 0

    def _fill(self) -> None:
        if self.off >= len(self.b):
            raise ValueError("JPEG scan data exhausted before EOI")
        byte = self.b[self.off]
        if byte == 0xFF:
            nxt = self.b[self.off + 1] if self.off + 1 < len(self.b) else None
            if nxt == 0x00:
                self.off += 2  # stuffed literal 0xFF
            else:
                raise ValueError("JPEG marker inside entropy data (truncated scan)")
        else:
            self.off += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_huff_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical construction as the encoder."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code, k = code + 1, k + 1
        code <<= 1
    return table


def _jpeg_idct_cos() -> list[list[float]]:
    """cos((2x+1)·u·π/16) lookup, computed once per process."""
    return [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)]


_IDCT_COS = _jpeg_idct_cos()
_IDCT_C = [1 / math.sqrt(2)] + [1.0] * 7


def decode_jpeg(b: bytes) -> tuple[int, int, bytes]:
    """Full baseline JPEG decode for 8-bit grayscale SOF0 (the general
    path — arbitrary DQT/DHT from the file, any dims with edge crop):
    returns (width, height, pixels) with pixels row-major uint8 bytes.
    Raises ValueError on anything outside baseline 1-component 1x1
    grayscale (progressive, subsampled, or color payloads fall back to
    Pillow in decode_media, same contract as decode_png/decode_bmp).
    Malformed bitstreams that would surface as struct.error/IndexError
    mid-parse (short SOF0/SOS payloads, truncated scans) are normalized
    to ValueError so decode_media's fallback contract holds."""
    import struct

    try:
        return _decode_jpeg_impl(b)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed JPEG: {e}") from e


def _decode_jpeg_impl(b: bytes) -> tuple[int, int, bytes]:
    import struct

    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    qts: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    width = height = None
    qt_id = dc_id = ac_id = 0
    off = 2
    scan_off = None
    while off + 4 <= len(b):
        if b[off] != 0xFF:
            raise ValueError(f"expected JPEG marker at offset {off}")
        marker = b[off + 1]
        if marker == 0xD9:  # EOI with no scan
            break
        (length,) = struct.unpack_from(">H", b, off + 2)
        seg = b[off + 4 : off + 2 + length]
        if len(seg) != length - 2:
            raise ValueError("JPEG segment extends past payload")
        if marker == 0xDB:  # DQT: one or more tables per segment
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                n = 64 * (2 if prec else 1)
                raw = seg[p + 1 : p + 1 + n]
                if len(raw) != n:
                    raise ValueError("truncated DQT")
                qts[tid] = (
                    [v for v in raw]
                    if not prec
                    else [struct.unpack_from(">H", raw, 2 * i)[0] for i in range(64)]
                )
                p += 1 + n
        elif marker == 0xC4:  # DHT: one or more tables per segment
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                if len(vals) != nvals:
                    raise ValueError("truncated DHT")
                (ac_tabs if cls else dc_tabs)[tid] = _jpeg_huff_decode_table(bits, vals)
                p += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component (grayscale) JPEG supported")
            _cid, sampling, qt_id = seg[6], seg[7], seg[8]
            if sampling != 0x11:
                raise ValueError("subsampled JPEG not supported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG (progressive/extended) not supported")
        elif marker == 0xDD:
            raise ValueError("JPEG restart intervals not supported")
        elif marker == 0xDA:  # SOS: entropy-coded scan follows
            if seg[0] != 1:
                raise ValueError("multi-component scan not supported")
            dc_id, ac_id = seg[2] >> 4, seg[2] & 0x0F
            scan_off = off + 2 + length
            break
        # else: APPn / COM / other segments skipped by length
        off += 2 + length
    if width is None or scan_off is None:
        raise ValueError("JPEG missing SOF0 or SOS")
    if qt_id not in qts or dc_id not in dc_tabs or ac_id not in ac_tabs:
        raise ValueError("JPEG scan references undeclared quant/Huffman table")
    qt, dct, act = qts[qt_id], dc_tabs[dc_id], ac_tabs[ac_id]
    bw, bh = (width + 7) // 8, (height + 7) // 8
    r = _JpegBitReader(b, scan_off)
    img = bytearray(width * height)
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            zz = [0] * 64
            size = r.huff(dct)
            diff = _jpeg_extend(r.bits(size), size) if size else 0
            pred += diff
            zz[0] = pred * qt[0]
            k = 1
            while k < 64:
                rs = r.huff(act)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                if k > 63:
                    raise ValueError("JPEG AC coefficient index out of range")
                zz[k] = _jpeg_extend(r.bits(rs & 0x0F), rs & 0x0F) * qt[k]
                k += 1
            coef = [0.0] * 64
            for i, v in enumerate(zz):
                if v:
                    coef[JPEG_ZIGZAG[i]] = float(v)
            # sparse IDCT: real blocks carry a handful of nonzero
            # coefficients, so enumerate them ONCE per block — in the
            # same (v, u) order and with the same multiply association
            # as the dense loop, so every float op is bit-identical —
            # instead of walking all 64 cells per pixel
            nz = [
                (u, v, coef[v * 8 + u])
                for v in range(8)
                for u in range(8)
                if coef[v * 8 + u]
            ]
            for y in range(min(8, height - by * 8)):
                row_base = (by * 8 + y) * width + bx * 8
                cy = _IDCT_COS[y]
                for x in range(min(8, width - bx * 8)):
                    cx = _IDCT_COS[x]
                    s = 0.0
                    for u, v, c in nz:
                        s += _IDCT_C[u] * (_IDCT_C[v] * cy[v]) * cx[u] * c
                    p = int(math.floor(s / 4 + 128 + 0.5))
                    img[row_base + x] = 0 if p < 0 else (255 if p > 255 else p)
    # the scan must terminate at EOI (possibly after pad bits)
    tail = b[r.off :]
    if not tail.startswith(b"\xff\xd9") and b"\xff\xd9" not in tail[:8]:
        raise ValueError("JPEG scan not terminated by EOI")
    return width, height, bytes(img)


JPEG_ROUNDTRIP_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, pixel_sum bigint, wxy_sum bigint"
)


def jpeg_roundtrip(docs: DataFrame) -> DataFrame:
    """LOSSY-codec round-trip under the oracle gate: per doc, derive a
    multi-block coefficient-domain image (one DC + one AC at raster
    (4,4) per 8x8 block, flat quant table 8) whose IDCT is EXACTLY
    integral — cos((2x+1)π/4) = ±√2/2, so the (4,4) basis contributes
    s(x)s(y)·ac with s = [+,−,−,+,+,−,−,+] and pixel(x,y) =
    128 + dc + s(x%8)s(y%8)·ac, clamping never fires. Encode a real
    baseline JPEG (DC prediction, ZRL runs over the 38 leading zeros,
    EOB, Annex K Huffman tables, byte stuffing), fully decode it back
    through the general SOF0 path, and emit two integer statistics the
    oracle recomputes arithmetically:

      pixel_sum = Σ pixels               (per block: 64·(dc+128); the
                                          ±ac checkerboard sums to 0)
      wxy_sum   = Σ pixels·(x%8)²·(y%8)² (per block: 19600·(dc+128)
                                          + 64·ac, since Σ s(x)·x² = 8)

    pixel_sum pins the DC path; wxy_sum pins AC magnitude AND sign.
    A hash match means Huffman decode, dequant, and the full 2-D IDCT
    reproduced every pixel of a genuinely lossy-format bitstream.
    Shuffle-free Arrow mapInPandas, same batch shape as decode_media."""
    ac_zz = JPEG_ZIGZAG.index(8 * 4 + 4)  # zigzag position of raster (4,4)
    qt = [8] * 64

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "pixel_sum", "wxy_sum")}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                d = int(doc_id)
                wb, hb = int(n_chars) % 3 + 1, d % 2 + 1
                blocks = []
                for bidx in range(wb * hb):
                    zz = [0] * 64
                    zz[0] = (d * 7 + bidx * 13) % 201 - 100
                    zz[ac_zz] = (d + bidx * 5) % 41 - 20
                    blocks.append(zz)
                w, h, pix = decode_jpeg(encode_jpeg(8 * wb, 8 * hb, blocks, qt))
                psum = sum(pix)
                wxy = sum(
                    pix[y * w + x] * (x % 8) ** 2 * (y % 8) ** 2
                    for y in range(h)
                    for x in range(w)
                )
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["pixel_sum"].append(psum)
                out["wxy_sum"].append(wxy)
            yield pd.DataFrame(out)

    return (
        docs.select("doc_id", "n_chars")
        .mapInPandas(roundtrip, JPEG_ROUNDTRIP_SCHEMA)
        .orderBy("doc_id")
    )


def encode_mjpeg_avi(width: int, height: int, jpeg_frames: list[bytes]) -> bytes:
    """Mux per-frame JPEG bitstreams into a RIFF/AVI MJPEG container —
    COMPRESSED video, the composition :func:`encode_avi` (uncompressed
    '00db' chunks) deliberately refuses: an avih main header, an strl
    LIST whose strh declares fccType 'vids' / fccHandler 'MJPG', and a
    movi LIST with one '00dc' (compressed) chunk per JPEG frame, all
    even-padded per RIFF. This is the real MJPEG-in-AVI layout
    (OpenDML/VfW convention: each 00dc payload is a standalone baseline
    JPEG)."""
    import struct

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")

    avih = bytearray(56)
    struct.pack_into("<I", avih, 16, len(jpeg_frames))  # dwTotalFrames
    struct.pack_into("<II", avih, 32, width, height)
    strh = bytearray(56)
    strh[0:4] = b"vids"
    strh[4:8] = b"MJPG"
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", bytes(strh)))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", bytes(avih)) + strl)
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def demux_mjpeg_avi(b: bytes) -> tuple[int, int, list[tuple[int, int, bytes]]]:
    """Demux AND fully decode an MJPEG AVI: walk the RIFF tree, read
    container dims from avih, verify the stream header declares a
    'vids'/'MJPG' handler, collect every compressed '..dc' chunk, and
    decode each through the vendored baseline JPEG decoder — the first
    path in this repo where a compressed VIDEO bitstream executes end to
    end (container parse + per-frame entropy decode + IDCT). Returns
    (width, height, [(frame_w, frame_h, pixels), ...]); raises
    ValueError on malformed containers, non-MJPG compressed streams, or
    frame dims disagreeing with the container."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/'AVI ' magic")
    dims: list[tuple[int, int]] = []
    handlers: list[tuple[bytes, bytes]] = []
    raw_frames: list[bytes] = []

    def walk(off: int, end: int) -> None:
        while off + 8 <= end:
            fourcc = b[off : off + 4]
            (size,) = struct.unpack_from("<I", b, off + 4)
            data_off = off + 8
            if data_off + size > len(b):
                raise ValueError("AVI chunk extends past payload")
            if fourcc == b"LIST":
                walk(data_off + 4, data_off + size)
            elif fourcc == b"avih":
                if size < 40:
                    raise ValueError("truncated avih header")
                dims.append(struct.unpack_from("<II", b, data_off + 32))
            elif fourcc == b"strh":
                if size < 8:
                    raise ValueError("truncated strh header")
                handlers.append((b[data_off : data_off + 4], b[data_off + 4 : data_off + 8]))
            elif fourcc[2:4] == b"dc":  # compressed frame chunk
                raw_frames.append(b[data_off : data_off + size])
            off = data_off + size + (size & 1)

    walk(12, len(b))
    if not dims:
        raise ValueError("AVI missing avih main header")
    if (b"vids", b"MJPG") not in handlers:
        raise ValueError("compressed AVI stream is not MJPG")
    width, height = dims[0]
    if width <= 0 or height <= 0:
        raise ValueError(f"implausible AVI dims {width}x{height}")
    decoded = [decode_jpeg(f) for f in raw_frames]
    for fw, fh, _ in decoded:
        if (fw, fh) != (width, height):
            raise ValueError(f"MJPEG frame dims {fw}x{fh} != container {width}x{height}")
    return width, height, decoded


MJPEG_ROUNDTRIP_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_frames bigint, "
    "pixel_sum bigint, wxy_sum bigint"
)


def mjpeg_roundtrip(docs: DataFrame) -> DataFrame:
    """COMPRESSED-VIDEO round-trip under the oracle gate — the
    composition of :func:`jpeg_roundtrip`'s lossy codec with the RIFF
    AVI container: per doc, synthesize nf = doc_id % 3 + 1 coefficient-
    domain 8x8 frames (same exactly-integral IDCT construction: one DC
    + one AC at raster (4,4), flat quant 8, so pixel(x,y) = 128 + dc +
    s(x)s(y)·ac with no clamping), entropy-code each into a standalone
    baseline JPEG, mux them as '00dc' MJPG chunks, then demux + fully
    decode every frame back and emit per-doc integer statistics the
    oracle recomputes arithmetically:

      pixel_sum = Σ_f 64·(dc_f + 128)
      wxy_sum   = Σ_f 19600·(dc_f + 128) + 64·ac_f

    A hash match means a real compressed VIDEO bitstream — container
    walk, stream-handler check, per-frame Huffman decode, dequant, 2-D
    IDCT — reconstructed every pixel of every frame. Shuffle-free Arrow
    mapInPandas, reference parity: the script extension slot promises
    arbitrary media payloads (/root/reference/script.go:120-240)."""
    ac_zz = JPEG_ZIGZAG.index(8 * 4 + 4)
    qt = [8] * 64

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("doc_id", "width", "height", "n_frames", "pixel_sum", "wxy_sum")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                jpegs = []
                for fidx in range(d % 3 + 1):
                    zz = [0] * 64
                    zz[0] = (d * 7 + fidx * 13) % 201 - 100
                    zz[ac_zz] = (d + fidx * 5) % 41 - 20
                    jpegs.append(encode_jpeg(8, 8, [zz], qt))
                w, h, frames = demux_mjpeg_avi(encode_mjpeg_avi(8, 8, jpegs))
                psum = wxy = 0
                for fw, fh, pix in frames:
                    psum += sum(pix)
                    wxy += sum(
                        pix[y * fw + x] * (x % 8) ** 2 * (y % 8) ** 2
                        for y in range(fh)
                        for x in range(fw)
                    )
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["pixel_sum"].append(psum)
                out["wxy_sum"].append(wxy)
            yield pd.DataFrame(out)

    return (
        docs.select("doc_id")
        .mapInPandas(roundtrip, MJPEG_ROUNDTRIP_SCHEMA)
        .orderBy("doc_id")
    )


def audio_trim(
    media: DataFrame,
    win: int = 400,
    hop: int = 160,
    rms_threshold: float = 25500.0,
    decode_stub: bool = True,
) -> DataFrame:
    """Silence trimming over the framed-RMS front end — the VAD pre-step
    every ASR training pipeline runs before cutting clips: per doc, the
    first and last analysis window whose RMS clears the energy floor,
    the active-window count/ratio, and the trimmed sample span those
    windows bound (first*hop .. last*hop + win, capped at the decoded
    length). All-quiet docs trim to 0 samples with NULL bounds — the
    rows a curation pass drops or routes to review.

    Composes on :func:`audio_windows` (same codec paths, same framing
    math), so the plan is the shuffle-free Arrow framing stage plus ONE
    per-doc partial aggregate — linear, no new Python."""
    wins = audio_windows(media, win=win, hop=hop, decode_stub=decode_stub)
    hot = F.col("rms") >= rms_threshold
    hot_idx = F.when(hot, F.col("win_idx"))
    n_active = F.sum(hot.cast("int")).cast("bigint")
    agg = wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        n_active.alias("n_active"),
        F.min(hot_idx).alias("first_active"),
        F.max(hot_idx).alias("last_active"),
        F.first("n_samples").alias("n_samples"),
    )
    span = F.least(
        F.col("last_active") * hop + win, F.col("n_samples")
    ) - F.col("first_active") * hop
    return agg.select(
        "doc_id",
        "n_windows",
        "n_active",
        "first_active",
        "last_active",
        F.when(F.col("n_active") > 0, span).otherwise(F.lit(0)).cast("bigint").alias(
            "trimmed_samples"
        ),
        F.round(F.col("n_active").cast("double") / F.col("n_windows"), 4).alias("active_ratio"),
    ).orderBy("doc_id")


# --- vendored IMA-ADPCM (DVI4 / WAV format 0x11, public spec) ----------
#
# The last modality without a real COMPRESSED bitstream under the
# oracle: images have PNG/JPEG, video has MJPEG, audio was raw PCM16 in
# WAV. IMA-ADPCM is the classic 4:1 speech codec — 4-bit codes, integer
# predictor + 89-entry step table (IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility", also RFC 3551 §4.5.1 DVI4 and
# the Microsoft WAVE format 0x11 registration). Pure integer math, so
# encode/decode are exactly reproducible cross-engine. Layout knowledge
# only; no code taken from anywhere. Reference analogue: the script
# extension slot's arbitrary-media promise (/root/reference/script.go).

ADPCM_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
ADPCM_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _adpcm_dec_step(pred: int, idx: int, c: int) -> tuple[int, int]:
    """One IMA decoder step (shift-based diff reconstruction): returns
    the new (predictor, step index). The same state update runs inside
    the encoder — that symmetry is what makes the codec streamable."""
    step = ADPCM_STEPS[idx]
    diff = step >> 3
    if c & 1:
        diff += step >> 2
    if c & 2:
        diff += step >> 1
    if c & 4:
        diff += step
    if c & 8:
        diff = -diff
    pred2 = max(-32768, min(32767, pred + diff))
    idx2 = max(0, min(88, idx + ADPCM_INDEX[c & 7]))
    return pred2, idx2


def adpcm_decode(codes: list[int], pred: int, idx: int) -> list[int]:
    """Decode a 4-bit code sequence from an initial (predictor, index)
    block-header state. Emits one sample per code (the header predictor
    itself is the block's sample 0 and is NOT emitted here)."""
    out = []
    for c in codes:
        pred, idx = _adpcm_dec_step(pred, idx, c)
        out.append(pred)
    return out


def adpcm_encode(samples: list[int], pred: int, idx: int) -> list[int]:
    """Encode samples against an initial (predictor, index) state: greedy
    magnitude quantization of the prediction residual at the current
    step size, then the decoder's own state update (encoder and decoder
    track identical state, so decode(encode(x)) drift is bounded by one
    step — and zero when the input lies on the decoder's reachable
    lattice, the property the roundtrip query's fixture exploits)."""
    out = []
    for s in samples:
        step = ADPCM_STEPS[idx]
        d = s - pred
        c = 8 if d < 0 else 0
        if c:
            d = -d
        if d >= step:
            c |= 4
            d -= step
        if d >= step >> 1:
            c |= 2
            d -= step >> 1
        if d >= step >> 2:
            c |= 1
        pred, idx = _adpcm_dec_step(pred, idx, c)
        out.append(c)
    return out


def encode_adpcm_wav(samples: list[int], idx0: int = 0, rate: int = 16000) -> bytes:
    """Container a sample sequence as a REAL WAV format 0x11 (IMA ADPCM)
    file, single mono block: RIFF/WAVE with the 20-byte fmt chunk
    (cbSize=2 + wSamplesPerBlock), the fact chunk compressed formats
    require (total sample count — it is what bounds nibble padding on
    decode), and one data block [int16 sample0, uint8 index, reserved 0,
    packed nibbles low-first]. sample0 is emitted verbatim; the nibbles
    encode samples[1:] against (sample0, idx0)."""
    import struct

    n = len(samples)
    codes = adpcm_encode(samples[1:], samples[0], idx0)
    nib = bytearray()
    for i in range(0, len(codes), 2):
        lo = codes[i]
        hi = codes[i + 1] if i + 1 < len(codes) else 0
        nib.append(lo | (hi << 4))
    block = struct.pack("<hBB", samples[0], idx0, 0) + bytes(nib)
    block_align = len(block)
    spb = (block_align - 4) * 2 + 1  # samples per FULL block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, rate * block_align // spb, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", n)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(block)) + block
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_adpcm_wav(b: bytes) -> tuple[int, list[int]]:
    """Parse a WAV format 0x11 file back to (rate, samples): RIFF walk,
    fmt/fact/data chunk parse, per-block header state + nibble unpack
    (low nibble first), decode recursion, fact-count crop of the final
    block's pad nibble. Raises ValueError on malformed input (the
    decode_jpeg error contract)."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    off, end = 12, len(b)
    fmt = fact_n = data = None
    while off + 8 <= end:
        cid, clen = b[off : off + 4], struct.unpack("<I", b[off + 4 : off + 8])[0]
        body = b[off + 8 : off + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"fact":
            if len(body) < 4:
                raise ValueError("truncated fact chunk")
            fact_n = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data = body
        off += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if fmt[0] != 0x11 or fmt[1] != 1:
        raise ValueError(f"not mono IMA-ADPCM (tag={fmt[0]:#x}, ch={fmt[1]})")
    block_align = fmt[4]  # (tag, ch, rate, byterate, BLOCK ALIGN, bits)
    samples: list[int] = []
    for boff in range(0, len(data), block_align):
        block = data[boff : boff + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block header")
        pred, idx, _ = struct.unpack("<hBB", block[:4])
        if idx > 88:
            raise ValueError(f"step index {idx} out of range")
        samples.append(pred)
        codes = []
        for byte in block[4:]:
            codes.append(byte & 0xF)
            codes.append(byte >> 4)
        samples.extend(adpcm_decode(codes, pred, idx))
    if fact_n is not None:
        if fact_n > len(samples):
            raise ValueError("fact count exceeds decoded samples")
        samples = samples[:fact_n]
    return fmt[2], samples


ADPCM_ROUNDTRIP_SCHEMA = (
    "doc_id bigint, n_samples bigint, sample_sum bigint, code_sum bigint, n_bytes bigint"
)


def adpcm_roundtrip(docs: DataFrame) -> DataFrame:
    """COMPRESSED-audio round-trip — the audio twin of
    :func:`jpeg_roundtrip`'s lossy-codec recipe: per doc, synthesize a
    signal ON the decoder's reachable lattice (decode a deterministic
    4-bit code sequence from an initial predictor/index), IMA-ADPCM
    encode it for real, container it as a REAL WAV format 0x11 file,
    fully parse + decode that bitstream back, and emit integer
    statistics of the DECODED samples plus the encoder's code sum and
    container size.

    Lattice construction (why a lossy codec hash-matches an exact
    oracle): when every input sample equals predictor + reconstructable
    diff at the current step, the greedy quantizer recovers the exact
    code, so encode∘decode is the identity on the code sequence and the
    WAV round-trip reproduces every sample bit-exactly. Code magnitudes
    cycle mod 6 (index table adjustments -1/-1/-1/-1/+2/+4 average +1/3,
    bounding the index walk ~25 above its start) and signs alternate by
    a doc-keyed parity, so |pred| stays ≤ ~8k — neither clamp ever
    fires, which the oracle fold replicates anyway. One degeneracy the
    construction also avoids (exhaustively swept over the full
    doc_id × n_chars space: zero mismatches, |pred| ≤ 1271): a SIGNED
    code with zero reconstructed diff (code 8 at step 7) re-encodes as
    code 0 — same samples, different code_sum; doc_id ≡ 0 (mod 8) never
    lands on magnitude 0 there because 8k mod 6 cycles {0,2,4}, missing
    the required residue. code_sum pins the
    ENCODER's emitted codes against the oracle's formula-derived ones;
    sample_sum pins the full container parse + decode recursion
    (header state, nibble order, step/index tables, fact-count crop)."""

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_samples", "sample_sum", "code_sum", "n_bytes")}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                did, n = int(doc_id), int(n_chars) % 41 + 8
                p0 = (did * 29) % 2001 - 1000
                i0 = did % 8
                codes = [
                    ((did * 7 + k * 13) % 6) | (8 if (did + k * 5) % 2 == 1 else 0)
                    for k in range(1, n)
                ]
                samples = [p0] + adpcm_decode(codes, p0, i0)
                wav = encode_adpcm_wav(samples, idx0=i0)
                _, back = decode_adpcm_wav(wav)
                if back != samples:  # pragma: no cover - lattice guarantee
                    raise ValueError(f"ADPCM roundtrip drift on doc {did}")
                enc = adpcm_encode(samples[1:], p0, i0)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(back))
                out["sample_sum"].append(sum(back))
                out["code_sum"].append(sum(enc))
                out["n_bytes"].append(len(wav))
            yield pd.DataFrame(out)

    return (
        docs.select("doc_id", "n_chars")
        .mapInPandas(roundtrip, ADPCM_ROUNDTRIP_SCHEMA)
        .orderBy("doc_id")
    )


def sniff_decode(b: bytes) -> dict:
    """Magic-byte dispatch over every vendored codec — the decode step a
    media INGEST pipeline runs on an opaque payload whose format is a
    claim, not a fact: detect the container from its magic, fully decode
    with the matching vendored decoder, return uniform metadata
    (format/width/height/n_frames/n_samples/sample_rate, absent
    dimensions as None). Raises ValueError for unknown magics and for
    payloads whose container lies about its contents — the dead-letter
    trigger (one bad payload must route to rejects, never kill the
    batch). Formats: BMP, PNG, baseline JPEG, RIFF/WAVE (PCM16 via
    stdlib wave, IMA-ADPCM 0x11 via the vendored decoder), RIFF/AVI
    (raw 'vids' and MJPG — MJPG frames are fully JPEG-decoded)."""
    import io
    import struct
    import wave

    out = {
        "format": None,
        "width": None,
        "height": None,
        "n_frames": None,
        "n_samples": None,
        "sample_rate": None,
    }
    if b[:2] == b"BM":
        w, h, _ = decode_bmp(b)
        return dict(out, format="bmp", width=w, height=h, n_frames=1)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h, _ = decode_png(b)
        return dict(out, format="png", width=w, height=h, n_frames=1)
    if b[:2] == b"\xff\xd8":
        w, h, _ = decode_jpeg(b)
        return dict(out, format="jpeg", width=w, height=h, n_frames=1)
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        # fmt tag decides the decoder: 0x01 PCM16 (stdlib), 0x11 IMA-ADPCM
        off = 12
        tag = None
        while off + 8 <= len(b):
            cid, clen = b[off : off + 4], struct.unpack("<I", b[off + 4 : off + 8])[0]
            if cid == b"fmt " and clen >= 2:
                if off + 10 > len(b):
                    raise ValueError("truncated fmt chunk")
                tag = struct.unpack("<H", b[off + 8 : off + 10])[0]
                break
            off += 8 + clen + (clen & 1)
        if tag == 0x11:
            rate, samples = decode_adpcm_wav(b)
            return dict(out, format="wav_adpcm", n_samples=len(samples), sample_rate=rate)
        try:
            with wave.open(io.BytesIO(b)) as wf:
                return dict(
                    out,
                    format="wav_pcm",
                    n_samples=wf.getnframes(),
                    sample_rate=wf.getframerate(),
                )
        except wave.Error as e:
            raise ValueError(f"malformed WAV: {e}") from e
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        try:
            # demux_mjpeg_avi fully DECODES every frame (entropy + IDCT)
            w, h, frames = demux_mjpeg_avi(b)
            return dict(out, format="avi_mjpeg", width=w, height=h, n_frames=len(frames))
        except ValueError:
            w, h, raw = demux_avi(b)
            return dict(out, format="avi_raw", width=w, height=h, n_frames=len(raw))
    raise ValueError(f"unknown media magic: {b[:8]!r}")
