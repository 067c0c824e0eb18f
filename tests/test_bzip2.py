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
