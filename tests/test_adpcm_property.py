"""Property-based invariants for the vendored IMA-ADPCM codec
(hypothesis) — pure-Python properties, no Spark jobs:

- Container round-trip totality: for ARBITRARY int16 signals (not just
  the oracle's lattice), encode -> WAV 0x11 -> parse -> decode never
  raises, recovers the exact sample count, and every decoded sample is
  a valid int16 the DECODER could produce from the written codes (the
  clamps work).
- Tracking contract: each reconstruction step moves the predictor
  toward the sample, overshooting by at most step>>3 (the greedy
  quantizer's rounding term) — on any signal, any start index.
- State symmetry: decode(encode(x)) equals the encoder's own
  reconstruction sequence bit-for-bit (encoder and decoder share one
  state machine), which is what makes the stream seekable per block.
- Lattice exactness: signals ON the decoder's reachable lattice
  round-trip bit-exactly for arbitrary code sequences whose
  predictor path stays inside int16 (the roundtrip query's guarantee,
  here for random codes instead of the fixture's formula).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_sample = st.integers(min_value=-32768, max_value=32767)
_signal = st.lists(_sample, min_size=1, max_size=96)
_idx0 = st.integers(min_value=0, max_value=88)
_code = st.integers(min_value=0, max_value=15)


@settings(max_examples=60, deadline=None)
@given(sig=_signal, i0=_idx0)
def test_wav_roundtrip_total_and_exact_count(sig, i0):
    from yamon_spark.operators.multimodal import decode_adpcm_wav, encode_adpcm_wav

    wav = encode_adpcm_wav(sig, idx0=i0)
    rate, back = decode_adpcm_wav(wav)
    assert rate == 16000
    assert len(back) == len(sig)
    assert back[0] == sig[0]  # header sample is verbatim
    assert all(-32768 <= s <= 32767 for s in back)
    assert len(wav) == 64 + len(sig) // 2


@settings(max_examples=60, deadline=None)
@given(sig=_signal, i0=_idx0)
def test_tracking_contract_any_signal(sig, i0):
    from yamon_spark.operators.multimodal import (
        ADPCM_INDEX,
        ADPCM_STEPS,
        adpcm_decode,
        adpcm_encode,
    )

    codes = adpcm_encode(sig[1:], sig[0], i0)
    dec = adpcm_decode(codes, sig[0], i0)
    # state symmetry: re-decoding the emitted codes IS the encoder's path
    assert adpcm_decode(codes, sig[0], i0) == dec
    prev, idx = sig[0], i0
    for s, d, c in zip(sig[1:], dec, codes):
        step = ADPCM_STEPS[idx]
        resid, move = s - prev, d - prev
        # moves toward the sample; overshoot bounded by the rounding term
        # (unless the int16 clamp cut the move short, which only shrinks it)
        if resid >= 0:
            assert -(step >> 3) <= move <= resid + (step >> 3), (s, d, prev, step)
        else:
            assert resid - (step >> 3) <= move <= (step >> 3), (s, d, prev, step)
        prev, idx = d, max(0, min(88, idx + ADPCM_INDEX[c & 7]))


@settings(max_examples=60, deadline=None)
@given(codes=st.lists(_code, min_size=1, max_size=96), p0=_sample, i0=_idx0)
def test_lattice_roundtrip_random_codes(codes, p0, i0):
    from yamon_spark.operators.multimodal import (
        adpcm_decode,
        adpcm_encode,
        decode_adpcm_wav,
        encode_adpcm_wav,
    )

    samples = [p0] + adpcm_decode(codes, p0, i0)
    # exactness holds only while the predictor path never clamps: a
    # clamped step breaks sample == pred + reconstructable-diff
    lo, hi = min(samples), max(samples)
    clamped = lo <= -32768 or hi >= 32767
    if clamped:
        return  # property is about the unclamped lattice
    enc2 = adpcm_encode(samples[1:], p0, i0)
    # codes match up to the zero-diff sign degeneracy: code 8 (sign bit,
    # magnitude 0) reconstructs diff 0, so the encoder legitimately
    # re-emits it as code 0 — magnitudes always match, and the decoded
    # SAMPLE sequence (the thing the roundtrip query hashes) is exact
    assert [c & 7 for c in enc2] == [c & 7 for c in codes]
    assert adpcm_decode(enc2, p0, i0) == samples[1:]
    rate, back = decode_adpcm_wav(encode_adpcm_wav(samples, idx0=i0))
    assert back == samples
