"""Property-based round-trips for the vendored real codecs (hypothesis):
any encode(params) must decode back to exactly those params, and
truncating/corrupting the container must raise ValueError, never return
wrong dims silently. Pure-Python (no Spark job per example)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from yamon_spark.operators import multimodal as M


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=512),
    h=st.integers(min_value=1, max_value=512),
)
def test_bmp_encode_decode_roundtrip(w, h):
    b = M.encode_bmp(w, h)
    assert M.decode_bmp(b) == (w, h, 1)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=64),
    cut=st.integers(min_value=1, max_value=20),
)
def test_bmp_truncation_never_silently_wrong(w, h, cut):
    b = M.encode_bmp(w, h)
    cut = min(cut, len(b) - 1)
    try:
        out = M.decode_bmp(b[: len(b) - cut])
    except ValueError:
        return  # loud failure is the contract
    raise AssertionError(f"truncated BMP decoded to {out}")


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=10_000),
    h=st.integers(min_value=1, max_value=10_000),
    frames=st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=8),
)
def test_avi_encode_demux_roundtrip(w, h, frames):
    b = M.encode_avi(w, h, frames)
    got_w, got_h, got_frames = M.demux_avi(b)
    assert (got_w, got_h) == (w, h)
    assert got_frames == frames  # byte-exact, odd lengths unharmed by padding


@settings(max_examples=100, deadline=None)
@given(
    frames=st.lists(st.binary(min_size=1, max_size=32), min_size=1, max_size=4),
    cut=st.integers(min_value=1, max_value=16),
)
def test_avi_truncation_never_silently_wrong(frames, cut):
    b = M.encode_avi(8, 8, frames)
    cut = min(cut, len(b) - 13)  # keep the RIFF magic intact: chunk walk must catch it
    try:
        _, _, got = M.demux_avi(b[: len(b) - cut])
    except ValueError:
        return
    # a clean cut can only ever drop whole trailing chunks, never corrupt
    assert got == frames[: len(got)]


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_encode_decode_roundtrip(w, h, seed):
    pix = bytes((seed * 31 + y * w + x * 7) % 256 for y in range(h) for x in range(w))
    got_w, got_h, got_sum = M.decode_png(M.encode_png(w, h, pix))
    assert (got_w, got_h) == (w, h)
    assert got_sum == sum(pix)  # inflate + all-5-filter unfilter is bit-exact


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=32),
    h=st.integers(min_value=5, max_value=32),  # h >= 5: every filter type present
    flip=st.integers(min_value=8, max_value=10_000),
)
def test_png_corruption_never_silently_wrong(w, h, flip):
    pix = bytes((y * w + x) % 256 for y in range(h) for x in range(w))
    b = bytearray(M.encode_png(w, h, pix))
    flip = min(flip, len(b) - 1)
    b[flip] ^= 0xFF  # any post-signature bit flip must trip a CRC/structure check
    try:
        out = M.decode_png(bytes(b))
    except Exception:
        return  # loud failure is the contract (ValueError or zlib.error)
    raise AssertionError(f"corrupted PNG decoded to {out}")


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=32),
    h=st.integers(min_value=1, max_value=32),
    cut=st.integers(min_value=1, max_value=64),
)
def test_png_truncation_never_silently_wrong(w, h, cut):
    pix = bytes((y + x) % 256 for y in range(h) for x in range(w))
    b = M.encode_png(w, h, pix)
    cut = min(cut, len(b) - 9)  # keep the signature: the chunk walk must catch it
    try:
        out = M.decode_png(b[: len(b) - cut])
    except Exception:
        return
    raise AssertionError(f"truncated PNG decoded to {out}")
