"""From-spec DEFLATE/zlib decoder (functions/inflate.py) vs stdlib zlib.

The ground truth for a from-spec entropy decoder is the reference C
implementation: every stream zlib produces must decode byte-identical,
and every stream OUR fixed-Huffman encoder produces must round-trip
through BOTH decoders.  Plus the spec's documented error paths."""

from __future__ import annotations

import random
import zlib

import pytest

from flinkexp_spark.functions.inflate import (
    InflateError,
    adler32,
    deflate_fixed_literals,
    inflate,
    zlib_decompress,
    zlib_wrap_fixed,
)


def _corpora():
    rng = random.Random(20260816)
    out = []
    for n in (0, 1, 2, 257, 4096, 9001):
        out.append(bytes(rng.randrange(256) for _ in range(n)))  # incompressible
        out.append(bytes((3 * (i % 64) + 7) % 256 for i in range(n)))  # periodic
        out.append((b"the quick brown fox " * 600)[:n])  # texty, long matches
        out.append(bytes(rng.choice(b"ab") for _ in range(n)))  # 2-symbol skew
    return out


def test_parity_with_zlib_all_levels() -> None:
    """Levels 0/1/6/9 exercise stored blocks, short/long LZ77 matches and
    dynamic Huffman tables; every output must be byte-identical."""
    for data in _corpora():
        for level in (0, 1, 6, 9):
            assert zlib_decompress(zlib.compress(data, level)) == data


def test_fixed_huffman_roundtrip_both_decoders() -> None:
    """BTYPE=1 coverage: zlib's compressor never emits fixed blocks, so
    the repo's own literal encoder provides them — and stdlib zlib must
    accept its output (proving the encoder is spec-correct, not just
    self-consistent)."""
    for data in _corpora():
        wrapped = zlib_wrap_fixed(data)
        assert zlib.decompress(wrapped) == data
        assert zlib_decompress(wrapped) == data


def test_raw_inflate_multiblock_and_overlap() -> None:
    """An overlapping copy (dist < len) self-extends; zlib emits exactly
    that for a run, and flush-split streams produce multiple blocks."""
    run = b"x" * 5000
    assert zlib_decompress(zlib.compress(run, 9)) == run
    co = zlib.compressobj(6)
    parts = [co.compress(b"abc" * 500), co.flush(zlib.Z_FULL_FLUSH)]
    parts += [co.compress(b"xyz" * 500), co.flush()]
    stream = b"".join(parts)
    assert zlib_decompress(stream) == b"abc" * 500 + b"xyz" * 500


def test_adler32_matches_zlib() -> None:
    for data in _corpora():
        assert adler32(data) == zlib.adler32(data)


def test_png_fixture_idat_streams_decode_identically() -> None:
    """The loop-closing check: the PNG encoder's real IDAT zlib streams
    (functions/png.py, which compresses with stdlib zlib) decode
    byte-identical through the from-spec inflate."""
    import numpy as np

    from flinkexp_spark.functions.png import encode_png

    y, x = np.indices((21, 17), dtype=np.int64)
    img = ((x * 31 + y * 17) % 256).astype(np.uint8)
    png = encode_png(img, 0, filter_seed=5)
    # walk chunks, concatenate IDAT payloads
    pos, idat = 8, b""
    while pos < len(png):
        ln = int.from_bytes(png[pos : pos + 4], "big")
        ctype = png[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    assert idat
    assert zlib_decompress(idat) == zlib.decompress(idat)


def test_error_paths() -> None:
    with pytest.raises(InflateError, match="short"):
        zlib_decompress(b"\x78\x01")
    with pytest.raises(InflateError, match="FCHECK"):
        zlib_decompress(b"\x79\x01" + b"\x00" * 8)
    with pytest.raises(InflateError, match="CM"):
        zlib_decompress(bytes([0x77, 31 - (0x77 * 256) % 31]) + b"\x00" * 8)
    good = bytearray(zlib.compress(b"hello world" * 40, 9))
    bad = good[:]
    bad[-1] ^= 0xFF
    with pytest.raises(InflateError, match="Adler-32"):
        zlib_decompress(bytes(bad))
    with pytest.raises(InflateError, match="truncated"):
        inflate(bytes(good[2:10]))
    # reserved BTYPE=3: bits are LSB-first -> 0b111 = BFINAL + BTYPE 3
    with pytest.raises(InflateError, match="BTYPE"):
        inflate(b"\x07\x00")
    # stored block with corrupted NLEN complement
    with pytest.raises(InflateError, match="LEN/NLEN"):
        inflate(b"\x01\x05\x00\x00\x00" + b"zzzzz")


def test_fixed_literal_encoder_is_minimal() -> None:
    """3 header bits + 8 bits/byte (values < 144) + 7 EOB bits, rounded
    up — the encoder must not pad beyond the spec minimum."""
    data = bytes(range(100))
    block = deflate_fixed_literals(data)
    assert len(block) == (3 + 8 * len(data) + 7 + 7) // 8


def test_gzip_container_parity_and_errors() -> None:
    """RFC 1952 walker vs stdlib gzip: bare members, FNAME headers,
    level-0 stored members, multi-member concatenation, and CRC-32
    against zlib.crc32; then the container error paths."""
    import gzip as _gz
    import io

    from flinkexp_spark.functions.inflate import crc32, gzip_decompress

    for data in _corpora()[:8]:
        assert gzip_decompress(_gz.compress(data, 9)) == data
        assert gzip_decompress(_gz.compress(data, 0)) == data
        buf = io.BytesIO()
        with _gz.GzipFile(
            filename="member.bin", mode="wb", fileobj=buf, mtime=0
        ) as f:
            f.write(data)
        assert gzip_decompress(buf.getvalue()) == data
        assert (
            gzip_decompress(_gz.compress(data) + _gz.compress(b"tail"))
            == data + b"tail"
        )
        assert crc32(data) == zlib.crc32(data)
    with pytest.raises(InflateError, match="magic"):
        gzip_decompress(b"\x1f\x8c" + b"\x00" * 20)
    with pytest.raises(InflateError, match="trailer"):
        gzip_decompress(_gz.compress(b"x")[:-1])
    corrupt = bytearray(_gz.compress(b"hello" * 100))
    corrupt[-5] ^= 0xFF
    with pytest.raises(InflateError, match="CRC-32"):
        gzip_decompress(bytes(corrupt))
    wrong_size = bytearray(_gz.compress(b"hello" * 100))
    wrong_size[-1] ^= 0x01
    with pytest.raises(InflateError, match="ISIZE"):
        gzip_decompress(bytes(wrong_size))
