"""GIF codec tests — LZW round-trips, interlace, container guards."""

import numpy as np
import pytest

from flinkexp_spark.functions.gif import (
    GifError,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _rng(seed):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# LZW layer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip_random(mcs):
    rng = _rng(mcs)
    data = rng.integers(0, 1 << mcs, size=5000, dtype=np.uint8)
    blob = lzw_encode(data, mcs)
    out = lzw_decode(blob, mcs, len(data))
    np.testing.assert_array_equal(out, data)


def test_lzw_kwkwk_case():
    # 'aaaa...' forces the code-equals-next-table-entry path immediately
    data = np.zeros(64, dtype=np.uint8)
    out = lzw_decode(lzw_encode(data, 2), 2, 64)
    np.testing.assert_array_equal(out, data)


def test_lzw_table_full_clear():
    # enough low-entropy data at mcs=2 to push the dictionary to 4096
    # entries and force the encoder's mid-stream CLEAR
    rng = _rng(1)
    data = rng.integers(0, 4, size=3_000_000, dtype=np.uint8)
    blob = lzw_encode(data, 2)
    out = lzw_decode(blob, 2, len(data))
    np.testing.assert_array_equal(out, data)


def test_lzw_truncation_raises():
    data = np.arange(100, dtype=np.uint8) % 4
    blob = lzw_encode(data, 2)
    with pytest.raises(GifError):
        lzw_decode(blob[: len(blob) // 2], 2, 100)


# ---------------------------------------------------------------------------
# container round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("local", [False, True])
def test_roundtrip(interlace, local):
    rng = _rng(7 + interlace * 2 + local)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    for h, w in [(1, 1), (5, 9), (13, 7), (32, 24)]:
        idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
        blob = encode_gif(idx, pal, interlace=interlace, local_palette=local)
        img, meta = decode_gif(blob)
        np.testing.assert_array_equal(img, pal[idx])
        assert meta["width"] == w and meta["height"] == h
        assert meta["interlace"] == interlace
        assert meta["local_palette"] == local
        assert meta["n_frames"] == 1


def test_interlaced_matches_progressive():
    rng = _rng(3)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(21, 13), dtype=np.uint8)
    a, _ = decode_gif(encode_gif(idx, pal, interlace=False))
    b, _ = decode_gif(encode_gif(idx, pal, interlace=True))
    np.testing.assert_array_equal(a, b)


def test_fuzz_roundtrip_many_shapes():
    rng = _rng(99)
    for trial in range(30):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        ncol = int(rng.integers(2, 64))
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
        blob = encode_gif(
            idx,
            pal,
            interlace=bool(trial % 2),
            local_palette=bool(trial % 3 == 0),
        )
        img, _ = decode_gif(blob)
        np.testing.assert_array_equal(img, pal[idx])


# ---------------------------------------------------------------------------
# malformed streams
# ---------------------------------------------------------------------------


def _blob():
    rng = _rng(5)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(8, 8), dtype=np.uint8)
    return encode_gif(idx, pal)


def test_bad_magic_raises():
    with pytest.raises(GifError, match="signature"):
        decode_gif(b"JIF89a" + _blob()[6:])


def test_missing_trailer_raises():
    with pytest.raises(GifError):
        decode_gif(_blob()[:-1])


def test_truncated_subblock_raises():
    with pytest.raises(GifError):
        decode_gif(_blob()[:-10])


def test_no_color_table_raises():
    blob = bytearray(_blob())
    blob[10] &= 0x7F  # clear the GCT flag; table bytes become garbage blocks
    with pytest.raises(GifError):
        decode_gif(bytes(blob))


def test_palette_index_out_of_range_rejected_on_encode():
    pal = np.zeros((2, 3), dtype=np.uint8)
    idx = np.full((4, 4), 3, dtype=np.uint8)
    with pytest.raises(GifError, match="index out of range"):
        encode_gif(idx, pal)
