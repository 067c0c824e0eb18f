"""FLAC codec contract: lossless round-trip, every subframe/stereo path,
checksum verification, malformed-stream rejection (the r08 compressed-audio
twin of tests/test_jpeg.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flinkexp_spark.functions.flac import (
    BitReader,
    crc8,
    crc16,
    decode_flac,
    decode_utf8_number,
    encode_flac,
    encode_utf8_number,
)


def _roundtrip(x: np.ndarray, **kw) -> np.ndarray:
    dec, _ = decode_flac(encode_flac(x, **kw))
    return dec


def test_crc_polynomials_match_known_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 (both init 0, MSB-first) have
    # well-known check values for the ASCII string "123456789":
    # CRC-8/SMBUS = 0xF4, CRC-16/BUYPASS = 0xFEE8.
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@given(st.integers(min_value=0, max_value=(1 << 36) - 1))
@settings(max_examples=200, deadline=None)
def test_utf8_number_roundtrip(n):
    assert decode_utf8_number(BitReader(encode_utf8_number(n))) == n


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from([1, 2]),
    st.sampled_from([16, 64, 192]),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_is_lossless(vals, channels, block_size):
    n = len(vals) // channels
    if n == 0:
        return
    x = np.array(vals[: n * channels], dtype=np.int64).reshape(n, channels)
    assert np.array_equal(_roundtrip(x, block_size=block_size), x)


def test_all_stereo_modes_and_forced_subframes_roundtrip():
    """force_modes cycles independent -> left/side -> right/side ->
    mid/side and injects a verbatim and an LPC frame; 6 blocks cover the
    full cycle plus both forced frames."""
    rng = np.random.RandomState(7)
    x = np.cumsum(rng.randint(-99, 100, size=(6 * 64, 2)), axis=0)
    x = np.clip(x, -32768, 32767)
    assert np.array_equal(_roundtrip(x, block_size=64), x)


def test_wasted_bits_path():
    """All-even samples share trailing zero bits -> the encoder uses the
    wasted-bits header and the decoder must shift them back in."""
    rng = np.random.RandomState(11)
    x = (rng.randint(-120, 121, size=(130, 1)) * 256).clip(-32768, 32767)
    enc = encode_flac(x, block_size=64)
    assert np.array_equal(decode_flac(enc)[0], x)


def test_constant_and_alternating_extremes():
    for fill in (-32768, 0, 32767):
        x = np.full((100, 2), fill, dtype=np.int64)
        assert np.array_equal(_roundtrip(x), x)
    x = np.tile([[-32768], [32767]], (80, 1))  # max-amplitude residuals
    assert np.array_equal(_roundtrip(x), x)


def test_md5_covers_the_whole_stream():
    x = np.arange(-100, 100, dtype=np.int64).reshape(-1, 1)
    enc = bytearray(encode_flac(x))
    # STREAMINFO md5 = bytes 4+4+18 .. 4+4+34 of the stream
    # (magic, block header, 18 bytes of streaminfo fields)
    enc[4 + 4 + 18] ^= 0x01
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc))


def test_frame_corruption_is_detected():
    """Flip one bit inside frame data: either a CRC check or a structural
    parse error must reject the stream — never silent wrong samples."""
    rng = np.random.RandomState(3)
    x = np.cumsum(rng.randint(-50, 51, size=(256, 2)), axis=0).clip(
        -32768, 32767
    )
    enc = encode_flac(x, block_size=64)
    # find the first frame: after magic + 4-byte block header + 34 bytes
    frame_start = 4 + 4 + 34
    corrupted = bytearray(enc)
    corrupted[frame_start + 10] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(corrupted))


def test_header_crc8_detects_header_bitflips():
    x = np.zeros((64, 1), dtype=np.int64)
    enc = bytearray(encode_flac(x, block_size=64))
    frame_start = 4 + 4 + 34
    enc[frame_start + 2] ^= 0x04  # inside the 4 header bytes
    with pytest.raises(ValueError):
        decode_flac(bytes(enc))


def test_truncated_stream_raises():
    x = np.arange(200, dtype=np.int64).reshape(-1, 1) - 100
    enc = encode_flac(x, block_size=64)
    for cut in (3, 10, 41, len(enc) // 2, len(enc) - 1):
        with pytest.raises(ValueError):
            decode_flac(enc[:cut])


def test_garbage_fuzz_never_returns_samples():
    """750 seeded random payloads (the codec-fuzz convention of
    tests/test_codec_fuzz.py): every one must raise a clean ValueError /
    NotImplementedError-style failure, never return PCM or crash the
    interpreter with an unbounded loop."""
    rng = np.random.RandomState(20260815)
    for trial in range(750):
        n = int(rng.randint(0, 300))
        payload = bytes(rng.randint(0, 256, size=n, dtype=np.uint8))
        if rng.randint(0, 2):
            payload = b"fLaC" + payload  # force it past the magic check
        with pytest.raises((ValueError, IndexError)):
            decode_flac(payload)


def test_compression_actually_compresses_smooth_signals():
    """A smooth (LPC-predictable) signal must come out SMALLER than raw
    PCM — the 'compressed' in compressed audio is real, not a container
    rename."""
    t = np.arange(4096)
    x = (
        (9000 * np.sin(t / 23.0) + 3000 * np.sin(t / 7.0))
        .astype(np.int64)
        .reshape(-1, 1)
    )
    enc = encode_flac(x, block_size=256)
    raw = x.size * 2
    assert len(enc) < raw * 0.8, f"flac {len(enc)}B vs raw {raw}B"


def test_fixture_payload_matches_oracle_synthesis():
    """The query fixture's decoded PCM must equal the oracle's arithmetic
    form exactly — the same identity the DuckDB oracle hashes."""
    from flinkexp_spark.functions import multimodal as M

    for doc_id, text in ((0, "hello world"), (1, "x" * 300), (5, "abc")):
        raw = text.encode("utf-8")
        n = len(raw) % M.FLAC_MAX_SAMPLES + M.FLAC_MIN_SAMPLES
        ch = doc_id % 2 + 1
        s = hashlib.md5(raw).digest()[0]
        g = np.arange(n * ch, dtype=np.int64)
        v = (s * 257 + g * 9973) % 65536 - 32768
        rate = M.FLAC_RATE_BASE + (doc_id % 3) * M.FLAC_RATE_STEP
        from flinkexp_spark.functions.flac import encode_flac as enc_f

        payload = enc_f(v.reshape(n, ch), sample_rate=rate, block_size=M.FLAC_BLOCK)
        pcm, got_rate = decode_flac(payload)
        assert got_rate == rate
        assert np.array_equal(pcm.reshape(-1), v)


def test_streaminfo_fields_roundtrip():
    x = np.arange(150, dtype=np.int64).reshape(-1, 2) - 37
    enc = encode_flac(x, sample_rate=16000, block_size=64)
    pcm, rate = decode_flac(enc)
    assert rate == 16000 and pcm.shape == (75, 2)
    # container sanity: magic + last-metadata STREAMINFO of 34 bytes
    assert enc[:4] == b"fLaC" and enc[4] == 0x80
    assert int.from_bytes(enc[5:8], "big") == 34
    # frame sync code on the first frame
    assert enc[42] == 0xFF and (enc[43] >> 2) == 0b111110


def test_spliced_frames_raise_sequence_error():
    """ADVICE r08: frame-level CRCs pass on a reordered/spliced stream;
    the coded frame number must catch it with a precise error instead of
    a generic final-MD5 mismatch."""
    x = np.arange(256, dtype=np.int64) % 97 - 48
    enc = encode_flac(x, block_size=64)
    # locate frame sync points (0xFF 0xF8) after the metadata blocks
    syncs = [
        i
        for i in range(4, len(enc) - 1)
        if enc[i] == 0xFF and (enc[i + 1] & 0xFC) == 0xF8
    ]
    assert len(syncs) >= 3, "fixture should hold >=3 frames"
    f0, f1, f2 = syncs[0], syncs[1], syncs[2]
    spliced = enc[:f0] + enc[f1:f2] + enc[f0:f1] + enc[f2:]
    with pytest.raises(ValueError, match="out of sequence"):
        decode_flac(spliced)
