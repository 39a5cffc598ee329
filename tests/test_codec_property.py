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
