"""G.711 codec unit tests — spec landmarks, inverse properties, container.

The companding math is pinned three ways: (1) spec landmark values from
the G.711 tables' published endpoints, (2) the exact inverse property
encode(decode(b)) == b over all 256 codes (the one documented exception
is µ-law 0x7F, the spec's "negative zero" alias of 0xFF — both expand to
0), (3) quantization-error bounds on decode(encode(x)) across the full
16-bit range.  The WAV container round-trips through the real RIFF
builder/parser.  The official query's DuckDB oracle replays the same
formulas in SQL (catalog/llm_multimodal.py multimodal_decode_g711_pcm).
"""

from __future__ import annotations

import numpy as np
import pytest

from flinkexp_spark.functions.g711 import (
    ALAW_DECODE_TABLE,
    ULAW_DECODE_TABLE,
    WAVE_FORMAT_ALAW,
    WAVE_FORMAT_MULAW,
    alaw_decode_byte,
    alaw_encode_sample,
    build_g711_wav,
    decode_g711_wav,
    encode_g711_wav,
    ulaw_decode_byte,
    ulaw_encode_sample,
)


def test_ulaw_spec_landmarks() -> None:
    # 0xFF is +0, 0x7F is the "negative zero" alias; 0x00 is the negative
    # clip (-8031 on the 14-bit scale = -32124 here), 0x80 the positive.
    assert ulaw_decode_byte(0xFF) == 0
    assert ulaw_decode_byte(0x7F) == 0
    assert ulaw_decode_byte(0x80) == 32124
    assert ulaw_decode_byte(0x00) == -((15 << 10) + 132 * 127)
    assert int(ULAW_DECODE_TABLE.max()) == 32124
    assert int(ULAW_DECODE_TABLE.min()) == -32124


def test_alaw_spec_landmarks() -> None:
    # After XOR 0x55: 0xD5 -> 0x80 (sign set = positive, seg 0, man 0) = +8;
    # 0x55 -> 0x00 = -8.  Max magnitude (15*16+264)<<6 = 32256.
    assert alaw_decode_byte(0xD5) == 8
    assert alaw_decode_byte(0x55) == -8
    assert int(ALAW_DECODE_TABLE.max()) == 32256
    assert int(ALAW_DECODE_TABLE.min()) == -32256


def test_ulaw_exact_inverse_on_codes() -> None:
    misses = [b for b in range(256) if ulaw_encode_sample(ulaw_decode_byte(b)) != b]
    assert misses == [0x7F]  # negative zero canonicalizes to 0xFF


def test_alaw_exact_inverse_on_codes() -> None:
    misses = [b for b in range(256) if alaw_encode_sample(alaw_decode_byte(b)) != b]
    assert misses == []


def test_quantization_error_bounds() -> None:
    xs = np.arange(-32768, 32768, 17)
    ue = max(abs(ulaw_decode_byte(ulaw_encode_sample(int(x))) - int(x)) for x in xs)
    ae = max(abs(alaw_decode_byte(alaw_encode_sample(int(x))) - int(x)) for x in xs)
    # top µ-law segment step is 1024 (plus clip at 32124); A-law's is 1024
    # with clip at 32256 — bounds follow from the segment widths.
    assert ue <= 32767 - 32124 + 1  # 644
    assert ae <= 32767 - 32256 + 1  # 512


def test_decode_tables_derive_from_formula() -> None:
    # the tables must BE the formula (no transcription drift)
    assert ULAW_DECODE_TABLE.shape == (256,)
    for b in (0, 1, 0x33, 0x7F, 0x80, 0xAB, 0xFE, 0xFF):
        assert int(ULAW_DECODE_TABLE[b]) == ulaw_decode_byte(b)
        assert int(ALAW_DECODE_TABLE[b]) == alaw_decode_byte(b)


@pytest.mark.parametrize("tag", [WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW])
def test_wav_container_roundtrip(tag: int) -> None:
    samples = np.array([0, 100, -100, 32000, -32000, 8, -8, 5000], np.int16)
    payload = encode_g711_wav(samples, 8000, tag)
    pcm, rate, t = decode_g711_wav(payload)
    assert (rate, t) == (8000, tag)
    # companded round-trip: exact on decode-image values, bounded elsewhere
    err = np.abs(pcm.astype(np.int64) - samples.astype(np.int64))
    assert int(err.max()) <= 644
    # re-decode of the re-encoded stream is a fixed point (idempotent)
    payload2 = encode_g711_wav(pcm, 8000, tag)
    pcm2, _, _ = decode_g711_wav(payload2)
    assert np.array_equal(pcm, pcm2)


def test_wav_container_odd_length_padding() -> None:
    # odd data chunks must pad to word alignment without changing samples
    codes = bytes([0xFF, 0xD5, 0x55])
    payload = build_g711_wav(codes, 8000, WAVE_FORMAT_MULAW)
    pcm, rate, tag = decode_g711_wav(payload)
    assert len(pcm) == 3 and rate == 8000 and tag == WAVE_FORMAT_MULAW


def test_wav_container_errors() -> None:
    with pytest.raises(ValueError, match="RIFF"):
        decode_g711_wav(b"nope")
    with pytest.raises(ValueError, match="format tag"):
        build_g711_wav(b"\x00", 8000, 0x0001)
    good = encode_g711_wav(np.array([1, 2], np.int16), 8000, WAVE_FORMAT_ALAW)
    with pytest.raises(ValueError, match="truncated"):
        decode_g711_wav(good[:-1])
