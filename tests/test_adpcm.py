"""IMA-ADPCM codec tests — table provenance, state machine, WAV container.

The oracle-side replay (recursive CTE) is exercised by the registered
query `multimodal_decode_adpcm_pcm` via driver_sim/test_correctness;
these tests pin the codec itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flinkexp_spark.functions.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    build_ima_wav,
    decode_ima_wav,
    decode_nibble,
    encode_ima_wav,
    encode_sample,
)


def test_step_table_matches_published_staircase() -> None:
    """89 entries, 7 -> 32767, strictly increasing, and (past the small
    integer-rounding region) every step grows by the published ~1.1x
    ratio — the IMA recommended practice's generating rule."""
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[-1] == 32767
    assert all(b > a for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))
    ratios = [b / a for a, b in zip(STEP_TABLE[8:], STEP_TABLE[9:])]
    assert min(ratios) > 1.05 and max(ratios) < 1.13
    assert INDEX_TABLE == (-1, -1, -1, -1, 2, 4, 6, 8)


def test_encoder_tracks_decoder_state_exactly() -> None:
    """encode_sample must advance (pred, index) identically to feeding
    its own nibble through decode_nibble — the invariant that makes the
    codec deterministic end-to-end."""
    rng = np.random.default_rng(3)
    pred, index = 0, 0
    for _ in range(2000):
        target = int(rng.integers(-32768, 32768))
        nib, pred2, index2 = encode_sample(target, pred, index)
        dpred, dindex = decode_nibble(nib, pred, index)
        assert (dpred, dindex) == (pred2, index2)
        pred, index = pred2, index2


def test_roundtrip_error_bounded_by_step() -> None:
    """Lossy contract: after the adaptive step settles, each
    reconstruction error is bounded by the CURRENT step size (the
    quantizer's granularity)."""
    t = np.arange(2000)
    x = (6000 * np.sin(t / 37) + 900 * np.sin(t / 5)).astype(np.int64)
    dec, rate = decode_ima_wav(encode_ima_wav(x, 16000))
    assert rate == 16000 and len(dec) == len(x)
    # the signal's max per-sample delta is ~340 -> steps stay moderate;
    # allow the startup transient to be worse than steady state
    assert np.abs(dec[100:] - x[100:]).max() < 1200
    assert np.abs(dec - x).mean() < 150


def test_constant_signal_is_exact() -> None:
    x = np.full(130, -777, dtype=np.int64)
    dec, _ = decode_ima_wav(encode_ima_wav(x, 8000))
    assert np.array_equal(dec, x)


def test_partial_tail_block_uses_fact_count() -> None:
    x = np.arange(70, dtype=np.int64) * 11 - 350  # 65-sample blocks: 70 = 65+5
    dec, _ = decode_ima_wav(encode_ima_wav(x, 8000))
    assert len(dec) == 70


def test_block_headers_reset_predictor() -> None:
    """Each block restarts from its header predictor — block 2 of a
    2-block stream must decode the same whether block 1 precedes it or
    not (the property that makes blocks seekable units)."""
    headers = [(100, 5), (-200, 12)]
    nibs = [[(7 * g) % 16 for g in range(64)], [(3 + 5 * g) % 16 for g in range(64)]]
    both, _ = decode_ima_wav(build_ima_wav(headers, nibs, 8000))
    solo, _ = decode_ima_wav(build_ima_wav(headers[1:], nibs[1:], 8000))
    assert np.array_equal(both[65:], solo)


def test_low_nibble_decodes_first() -> None:
    """WAV-IMA packs the earlier sample in the LOW 4 bits; a byte with
    distinct nibbles must decode low-first."""
    wav = build_ima_wav([(0, 10)], [[4, 12] + [0] * 62], 8000)
    dec, _ = decode_ima_wav(wav)
    # nibble 4 (magnitude +4) first: sample goes UP before nibble 12 pulls down
    assert dec[1] > dec[0]
    step = STEP_TABLE[10]
    assert dec[1] == (step >> 3) + step  # +vpdiff of nibble 4


def test_container_rejections() -> None:
    x = np.arange(65, dtype=np.int64)
    wav = bytearray(encode_ima_wav(x, 8000))
    with pytest.raises(ValueError, match="RIFF"):
        decode_ima_wav(b"OggS" + bytes(wav[4:]))
    # PCM tag instead of 0x0011
    fmt_at = wav.find(b"fmt ")
    bad = bytearray(wav)
    struct.pack_into("<H", bad, fmt_at + 8, 1)
    with pytest.raises(ValueError, match="IMA-ADPCM"):
        decode_ima_wav(bytes(bad))
    # stereo is out of scope and must say so
    bad = bytearray(wav)
    struct.pack_into("<H", bad, fmt_at + 10, 2)
    with pytest.raises(NotImplementedError, match="mono"):
        decode_ima_wav(bytes(bad))
    # ragged data chunk
    bad = bytearray(wav)
    data_at = bad.find(b"data")
    (dlen,) = struct.unpack_from("<I", bad, data_at + 4)
    struct.pack_into("<I", bad, data_at + 4, dlen - 1)
    with pytest.raises(ValueError, match="whole number of blocks"):
        decode_ima_wav(bytes(bad[:-1]))
    # fact chunk claiming more samples than the data carries
    bad = bytearray(wav)
    fact_at = bad.find(b"fact")
    struct.pack_into("<I", bad, fact_at + 8, 10_000)
    with pytest.raises(ValueError, match="fact chunk"):
        decode_ima_wav(bytes(bad))


def test_fuzz_random_nibble_streams_always_decode() -> None:
    """Any nibble stream is a VALID IMA stream (the state machine is
    total); decode must never raise and never leave int16 range."""
    rng = np.random.default_rng(11)
    for _ in range(25):
        nb = int(rng.integers(1, 4))
        headers = [
            (int(rng.integers(-32768, 32768)), int(rng.integers(0, 89)))
            for _ in range(nb)
        ]
        nibs = [[int(v) for v in rng.integers(0, 16, 64)] for _ in range(nb)]
        dec, _ = decode_ima_wav(build_ima_wav(headers, nibs, 8000))
        assert len(dec) == nb * 65
        assert dec.min() >= -32768 and dec.max() <= 32767
