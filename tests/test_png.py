"""PNG codec tests — round-trip properties and malformed-stream guards.

PNG is lossless, so every round-trip assertion is exact equality; the
decoder must also FAIL loudly on corrupt streams (bad CRC, truncation,
unsupported depth) rather than emit plausible garbage.
"""

import struct
import zlib

import numpy as np
import pytest

from flinkexp_spark.functions.png import (
    ADAM7_PASSES,
    PNG_SIGNATURE,
    PngError,
    decode_png,
    encode_png,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _random_image(rng, h, w, ch):
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
@pytest.mark.parametrize("interlace", [0, 1])
def test_roundtrip_color_types(color_type, ch, interlace):
    rng = _rng(color_type * 10 + interlace)
    for h, w in [(1, 1), (3, 2), (7, 13), (16, 16), (23, 9)]:
        img = _random_image(rng, h, w, ch)
        src = img[:, :, 0] if ch == 1 else img
        blob = encode_png(
            src, color_type, interlace=interlace, filter_seed=h + w
        )
        out, meta = decode_png(blob)
        assert out.shape == (h, w, ch)
        np.testing.assert_array_equal(out, img)
        assert meta["width"] == w and meta["height"] == h
        assert meta["interlace"] == interlace


@pytest.mark.parametrize("interlace", [0, 1])
def test_roundtrip_palette(interlace):
    rng = _rng(42 + interlace)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(11, 7), dtype=np.uint8)
    blob = encode_png(idx, 3, palette=palette, interlace=interlace)
    out, meta = decode_png(blob)
    np.testing.assert_array_equal(out, palette[idx])
    assert meta["palette_size"] == 16


def test_every_filter_type_roundtrips():
    # filter_seed rotates the cycle; 5 seeds x >=5 rows covers every
    # (filter, row-position) combination including row 0 (prev = zeros).
    rng = _rng(7)
    img = _random_image(rng, 6, 5, 3)
    blobs = set()
    for seed in range(5):
        blob = encode_png(img, 2, filter_seed=seed)
        out, _ = decode_png(blob)
        np.testing.assert_array_equal(out, img)
        blobs.add(blob)
    assert len(blobs) == 5  # the seeds genuinely changed the filtering


def test_interlaced_equals_progressive_pixels():
    rng = _rng(11)
    img = _random_image(rng, 21, 17, 4)
    a, _ = decode_png(encode_png(img, 6, interlace=0))
    b, _ = decode_png(encode_png(img, 6, interlace=1))
    np.testing.assert_array_equal(a, b)


def test_multi_idat_split_decodes():
    rng = _rng(13)
    img = _random_image(rng, 9, 9, 3)
    whole = encode_png(img, 2)
    split = encode_png(img, 2, idat_split=32)
    assert split.count(b"IDAT") > whole.count(b"IDAT")
    np.testing.assert_array_equal(decode_png(split)[0], decode_png(whole)[0])


def test_adam7_pass_grid_is_a_partition():
    # the 7 passes tile the 8x8 grid exactly once — derivation sanity
    seen = set()
    for x0, y0, dx, dy in ADAM7_PASSES:
        for y in range(y0, 8, dy):
            for x in range(x0, 8, dx):
                assert (x, y) not in seen
                seen.add((x, y))
    assert len(seen) == 64


def test_fuzz_roundtrip_many_shapes():
    rng = _rng(99)
    for trial in range(40):
        h = int(rng.integers(1, 25))
        w = int(rng.integers(1, 25))
        ct = int(rng.choice([0, 2, 3, 6]))
        inter = int(rng.integers(0, 2))
        if ct == 3:
            pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
            idx = rng.integers(0, 8, size=(h, w), dtype=np.uint8)
            blob = encode_png(
                idx, 3, palette=pal, interlace=inter, filter_seed=trial
            )
            expect = pal[idx]
        else:
            ch = {0: 1, 2: 3, 6: 4}[ct]
            img = _random_image(rng, h, w, ch)
            src = img[:, :, 0] if ch == 1 else img
            blob = encode_png(src, ct, interlace=inter, filter_seed=trial)
            expect = img
        out, _ = decode_png(blob)
        np.testing.assert_array_equal(out, expect)


# ---------------------------------------------------------------------------
# malformed streams fail loudly
# ---------------------------------------------------------------------------


def _blob():
    img = _random_image(_rng(5), 8, 8, 3)
    return encode_png(img, 2)


def test_bad_signature_raises():
    with pytest.raises(PngError, match="signature"):
        decode_png(b"NOTAPNG" + _blob())


def test_chunk_crc_corruption_raises():
    blob = bytearray(_blob())
    # flip one byte inside the IDAT payload (after its 8-byte header)
    pos = blob.index(b"IDAT") + 10
    blob[pos] ^= 0xFF
    with pytest.raises(PngError, match="CRC mismatch"):
        decode_png(bytes(blob))


def test_truncated_stream_raises():
    with pytest.raises(PngError):
        decode_png(_blob()[:-12])


def test_unsupported_bit_depth_raises():
    # hand-build an IHDR claiming 16-bit samples
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    blob = (
        PNG_SIGNATURE
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + struct.pack(">I", 0)
        + b"IEND"
        + struct.pack(">I", zlib.crc32(b"IEND") & 0xFFFFFFFF)
    )
    with pytest.raises(PngError, match="bit depth 16"):
        decode_png(blob)


def test_palette_without_plte_raises():
    idx = np.zeros((4, 4), dtype=np.uint8)
    pal = np.zeros((2, 3), dtype=np.uint8)
    blob = bytearray(encode_png(idx, 3, palette=pal))
    # excise the PLTE chunk (12-byte framing + 6 payload bytes)
    start = blob.index(b"PLTE") - 4
    del blob[start : start + 12 + 6]
    with pytest.raises(PngError, match="without PLTE"):
        decode_png(bytes(blob))


def test_palette_index_out_of_range_raises():
    pal = np.zeros((2, 3), dtype=np.uint8)
    idx = np.full((4, 4), 7, dtype=np.uint8)
    with pytest.raises(PngError, match="palette index"):
        encode_png(idx, 3, palette=pal)


def test_wrong_pixel_stream_length_raises():
    # IHDR says 8x8 but the pixel stream carries 4x4: inflate succeeds,
    # the scanline walk must notice
    img = _random_image(_rng(3), 4, 4, 3)
    blob = bytearray(encode_png(img, 2))
    ih = blob.index(b"IHDR") + 4
    blob[ih : ih + 8] = struct.pack(">II", 8, 8)
    # re-seal the IHDR CRC so only the dimension lie remains
    payload = bytes(blob[ih : ih + 13])
    blob[ih + 13 : ih + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + payload) & 0xFFFFFFFF
    )
    with pytest.raises(PngError, match="shorter"):
        decode_png(bytes(blob))
