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


def test_dynamic_block_with_no_distance_codes() -> None:
    """RFC 1951 lets a block that never references a distance emit a
    single zero-length distance code (HDIST=1, all lengths 0); zlib's
    inflate accepts such streams and ours must too (ADVICE r12).  The
    stream is hand-assembled: literals {65:'A', 256:EOB} at length 1,
    every other length zero, data 'AAA'."""
    bits: list[int] = []

    def emit(value: int, nbits: int) -> None:  # header fields: LSB-first
        for i in range(nbits):
            bits.append((value >> i) & 1)

    def emit_code(code: int, nbits: int) -> None:  # Huffman: MSB-first
        for i in range(nbits - 1, -1, -1):
            bits.append((code >> i) & 1)

    emit(1, 1)  # BFINAL
    emit(2, 2)  # BTYPE=2 dynamic
    emit(0, 5)  # HLIT  -> 257 literal codes
    emit(0, 5)  # HDIST -> 1 distance code
    emit(14, 4)  # HCLEN -> 18 code-length codes (covers syms 18, 0, 1)
    # CLC lengths in the spec's order 16 17 18 0 8 7 9 6 10 5 11 4 12 3
    # 13 2 14 1: sym18 -> 1, sym0 -> 2, sym1 -> 2, rest 0
    clc_len = {18: 1, 0: 2, 1: 2}
    order = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1)
    for sym in order:
        emit(clc_len.get(sym, 0), 3)
    # canonical CLC codes: sym18 (len 1) -> 0; sym0 -> 10; sym1 -> 11
    clc = {18: (0b0, 1), 0: (0b10, 2), 1: (0b11, 2)}

    def clc_sym(sym: int) -> None:
        emit_code(*clc[sym])

    clc_sym(18); emit(65 - 11, 7)   # 65 zeros (literals 0..64)
    clc_sym(1)                       # literal 65 ('A') -> length 1
    clc_sym(18); emit(138 - 11, 7)  # 138 zeros (66..203)
    clc_sym(18); emit(52 - 11, 7)   # 52 zeros (204..255)
    clc_sym(1)                       # literal 256 (EOB) -> length 1
    clc_sym(0)                       # the single ZERO-length distance code
    # literal codes: sym65 -> 0, sym256 -> 1 (canonical, both length 1)
    emit_code(0, 1); emit_code(0, 1); emit_code(0, 1)  # 'AAA'
    emit_code(1, 1)  # EOB
    raw = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        raw[i // 8] |= b << (i % 8)
    raw = bytes(raw)
    assert zlib.decompress(raw, wbits=-15) == b"AAA"  # zlib accepts it
    assert inflate(raw) == b"AAA"


def test_zlib_trailing_garbage_is_a_distinct_diagnosis() -> None:
    """A valid zlib stream followed by extra bytes must fail with an
    explicit trailing-bytes error read at the deflate END CURSOR — not a
    misleading Adler-32 mismatch (ADVICE r12)."""
    good = zlib.compress(b"payload" * 50, 6)
    assert zlib_decompress(good) == b"payload" * 50
    with pytest.raises(InflateError, match="trailing bytes"):
        zlib_decompress(good + b"junk")
    with pytest.raises(InflateError, match="truncated Adler-32"):
        zlib_decompress(good[:-2])
