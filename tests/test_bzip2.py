"""From-spec bzip2 decoder (functions/bzip2.py) vs stdlib bz2.

Same contract as tests/test_inflate.py: every stream the reference
implementation produces must decode byte-identical, across compression
levels, block counts, stream concatenation, and RLE1-heavy inputs — plus
the documented error paths.  ``import bz2`` lives ONLY here and in fixture
synthesis, never on the decode path.
"""

from __future__ import annotations

import bz2
import random

import pytest

from flinkexp_spark.functions.bzip2 import (
    Bzip2Error,
    bz2_crc32,
    bz2_decompress,
)


def _corpora():
    rng = random.Random(20260816)
    out = []
    for n in (0, 1, 2, 257, 4096, 9001):
        out.append(bytes(rng.randrange(256) for _ in range(n)))  # incompressible
        out.append(bytes((3 * (i % 64) + 7) % 256 for i in range(n)))  # periodic
        out.append((b"the quick brown fox " * 600)[:n])  # texty
        out.append(b"\x00" * n)  # single-symbol, RLE1-maximal
        out.append(bytes(((i // 9) * 13) % 256 for i in range(n)))  # 9-runs
    return out


def test_parity_with_bz2_all_levels() -> None:
    for data in _corpora():
        for level in (1, 5, 9):
            assert bz2_decompress(bz2.compress(data, level)) == data


def test_multi_block_single_stream() -> None:
    """A 250 KB payload at level 1 (100k block size) spans multiple
    blocks — exercises the stream-combined CRC rotation."""
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(250_000))
    assert bz2_decompress(bz2.compress(data, 1)) == data


def test_multi_stream_concatenation() -> None:
    """Byte-aligned concatenated streams decode to the concatenated
    plaintext (stdlib bz2.decompress semantics)."""
    a, b = b"first stream " * 50, b"second " * 99
    joined = bz2.compress(a, 9) + bz2.compress(b, 1)
    assert bz2_decompress(joined) == a + b
    assert bz2.decompress(joined) == a + b  # the reference agrees


def test_rle1_run_shapes() -> None:
    """Runs of exactly 4 (count byte 0), 4+k, and 255+ (run split across
    count bytes at encode) all survive the RLE1 undo."""
    for run in (3, 4, 5, 8, 9, 251, 255, 256, 300, 1000):
        data = b"x" * run + b"y" + b"z" * run
        assert bz2_decompress(bz2.compress(data, 9)) == data


def test_crc32_is_the_nonreflected_variant() -> None:
    """bzip2's CRC-32 uses poly 0x04C11DB7 MSB-first — it must NOT match
    zlib's reflected CRC for the same input (sanity that we implemented
    the right variant), and must match the reference stream's embedded
    block CRC (proven transitively by every parity case above)."""
    import zlib

    data = b"123456789"
    assert bz2_crc32(data) == 0xFC891918  # published check value for this poly
    assert bz2_crc32(data) != zlib.crc32(data)


def test_error_paths() -> None:
    with pytest.raises(Bzip2Error, match="short"):
        bz2_decompress(b"BZh9")
    with pytest.raises(Bzip2Error, match="magic"):
        bz2_decompress(b"XZh9" + b"\x00" * 20)
    with pytest.raises(Bzip2Error, match="level"):
        bz2_decompress(b"BZh0" + b"\x00" * 20)
    good = bytearray(bz2.compress(b"hello world" * 40, 9))
    # flip a bit inside the Huffman payload -> CRC (or structure) error
    bad = good[:]
    bad[len(bad) // 2] ^= 0x10
    with pytest.raises(Bzip2Error):
        bz2_decompress(bytes(bad))
    # truncation mid-stream
    with pytest.raises(Bzip2Error, match="truncated"):
        bz2_decompress(bytes(good[:20]))
    # trailing garbage after a complete stream is a loud magic error —
    # DELIBERATELY stricter than stdlib bz2.decompress, which silently
    # ignores non-stream trailing bytes
    with pytest.raises(Bzip2Error, match="magic"):
        bz2_decompress(bytes(good) + b"junk junk junk")


def _pack_msb_bits(bitstr: str) -> bytes:
    """Pack a '0'/'1' string MSB-first, zero-padded to a byte boundary."""
    bitstr += "0" * (-len(bitstr) % 8)
    return bytes(
        int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8)
    )


def test_rle2_run_guard_fires_before_allocation() -> None:
    """A crafted RUNA/RUNB chain (bijective base-2, so ~40 symbols request
    a multi-terabyte run) must raise BEFORE attempting the bwt allocation
    (r13 ADVICE item, functions/bzip2.py)."""
    from flinkexp_spark.functions.bzip2 import (
        _BitReader,
        _decode_mtf_rle2,
        _Huffman,
    )

    # alpha 3 (one used byte): RUNA=0 len1 code 0, RUNB=1 len2 code 10,
    # EOB=2 len2 code 11 — a complete canonical code
    huff = _Huffman([1, 2, 2])
    bits = "10" * 40 + "11"  # 40 RUNBs -> run ~ 2^41, then EOB
    br = _BitReader(_pack_msb_bits(bits))
    with pytest.raises(Bzip2Error, match="exceeds its declared size"):
        _decode_mtf_rle2(br, [65], [huff], [0, 0], max_block=900_000)


def test_rle2_extend_guard_checks_accumulated_length() -> None:
    """run <= max_block alone is not enough: len(bwt) + run must also be
    guarded before the extend (r13 ADVICE item)."""
    from flinkexp_spark.functions.bzip2 import (
        _BitReader,
        _decode_mtf_rle2,
        _Huffman,
    )

    # alpha 4 (two used bytes): RUNA=00, RUNB=01, literal sym2=10, EOB=11
    huff = _Huffman([2, 2, 2, 2])
    # 60 literals, then RUNBs summing to run=126 (<=150), then a literal
    # forces the flush: 60 + 126 > 150 -> must raise at the extend guard
    bits = "10" * 60 + "01" * 6 + "10" + "11"
    br = _BitReader(_pack_msb_bits(bits))
    with pytest.raises(Bzip2Error, match="exceeds its declared size"):
        _decode_mtf_rle2(br, [65, 66], [huff], [0, 0], max_block=150)
