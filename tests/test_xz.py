"""From-spec .xz container walker (functions/xz.py) vs real xz + stdlib lzma.

TWO reference implementations exist in this environment (the ``xz``
binary and Python's ``lzma`` module), so this suite pins BOTH directions
against both:

* every stored stream OUR encoder emits must decode byte-identical under
  the real binary and under stdlib lzma — which also verifies our
  CRC-32/CRC-64/SHA-256 block checks and all the header CRCs;
* the real binary's output for INCOMPRESSIBLE data consists of LZMA2
  uncompressed chunks, which our walker must decode byte-identical —
  across every check type and the multithreaded with-sizes block layout;
* r14: the real binary's COMPRESSED output (range-coded LZMA2 chunks,
  functions/lzma2.py) must decode byte-identical across presets,
  extreme mode, threading and block splits (the raw-chunk-layer tests
  live in tests/test_lzma2.py).

``import lzma`` lives ONLY here and in tests/test_lzma2.py.
"""

from __future__ import annotations

import lzma
import random
import shutil
import struct
import subprocess

import pytest

from flinkexp_spark.functions.xz import (
    XzError,
    _vli_decode,
    _vli_encode,
    crc64_xz,
    xz_compress_stored,
    xz_decompress,
    xz_stream_padding,
)

_XZ_BIN = shutil.which("xz")
needs_xz = pytest.mark.skipif(_XZ_BIN is None, reason="no xz binary")


def _real_decode(blob: bytes) -> bytes:
    p = subprocess.run([_XZ_BIN, "-d", "-c"], input=blob, capture_output=True)
    assert p.returncode == 0, p.stderr.decode()[:300]
    return p.stdout


def _real_encode(data: bytes, *flags: str) -> bytes:
    p = subprocess.run([_XZ_BIN, "-c", *flags], input=data, capture_output=True)
    assert p.returncode == 0, p.stderr.decode()[:300]
    return p.stdout


def _corpora():
    rng = random.Random(20260816)
    return [
        b"",
        b"x",
        b"the quick brown fox\n" * 40,
        bytes(rng.randrange(256) for _ in range(1000)),
        bytes(rng.randrange(256) for _ in range(70_000)),  # > one chunk
        bytes(rng.randrange(256) for _ in range(200_001)),
    ]


def test_crc64_xz_check_vector() -> None:
    # the canonical CRC-64/XZ check value (ECMA-182 reflected)
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA
    assert crc64_xz(b"") == 0


def test_vli_roundtrip_and_bounds() -> None:
    for v in (0, 1, 127, 128, 16383, 16384, (1 << 63) - 1):
        enc = _vli_encode(v)
        got, pos = _vli_decode(enc, 0)
        assert (got, pos) == (v, len(enc))
    with pytest.raises(XzError, match="out of range"):
        _vli_encode(1 << 63)
    with pytest.raises(XzError, match="truncated"):
        _vli_decode(b"\x80\x80", 0)
    with pytest.raises(XzError, match="9 bytes"):
        _vli_decode(b"\x80" * 10, 0)
    with pytest.raises(XzError, match="non-minimal"):
        _vli_decode(b"\x80\x00", 0)


@pytest.mark.parametrize("check", ["none", "crc32", "crc64", "sha256"])
def test_stored_roundtrip_self_and_stdlib(check: str) -> None:
    for data in _corpora():
        for bb in (None, 30_000):
            for ws in (False, True):
                blob = xz_compress_stored(
                    data, check=check, block_bytes=bb, with_sizes=ws
                )
                assert xz_decompress(blob) == data
                assert lzma.decompress(blob) == data


@needs_xz
@pytest.mark.parametrize("check", ["none", "crc32", "crc64", "sha256"])
def test_stored_frames_accepted_by_real_xz(check: str) -> None:
    for data in _corpora()[2:]:
        blob = xz_compress_stored(data, check=check, block_bytes=25_000)
        assert _real_decode(blob) == data


@needs_xz
def test_walker_decodes_real_xz_incompressible() -> None:
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(150_000))
    for flags in (
        ("-6",),
        ("--check=crc32",),
        ("--check=crc64",),
        ("--check=sha256",),
        ("--check=none",),
        ("-T4", "--block-size=40000"),  # with-sizes multi-block headers
    ):
        assert xz_decompress(_real_encode(data, *flags)) == data


def test_multi_stream_concatenation_and_padding() -> None:
    a = xz_compress_stored(b"hello ", check="crc32")
    b = xz_compress_stored(b"world", check="sha256")
    assert xz_decompress(a + b) == b"hello world"
    assert xz_decompress(a + xz_stream_padding(3) + b) == b"hello world"
    # non-multiple-of-4 padding is a loud error (spec: 4-byte units)
    with pytest.raises(XzError, match="multiple of 4"):
        xz_decompress(a + b"\x00\x00" + b)


@needs_xz
@pytest.mark.parametrize(
    "flags",
    [
        ("-0",),
        ("-6",),
        ("-9", "-e"),
        ("-6", "--threads=4", "--block-size=262144"),  # multi-block
        ("-6", "--check=sha256"),
    ],
)
def test_walker_decodes_real_xz_compressed(flags: tuple[str, ...]) -> None:
    """r14: LZMA2 compressed chunks decode through functions/lzma2.py —
    the former scope boundary is retired.  Compressible payloads force
    range-coded chunks; the multithreaded flags force block splits."""
    rng = random.Random(14)
    data = (
        b"header: spark graft xz pin\n" * 2000
        + bytes(rng.randrange(256) for _ in range(50_000))
        + b"trailer repeats " * 5000
    )
    blob = _real_encode(data, *flags)
    assert xz_decompress(blob) == data


@needs_xz
def test_walker_decodes_real_xz_large_multichunk() -> None:
    """> 2 MiB of compressible data spans multiple LZMA2 compressed
    chunks inside one block — match distances legally reach across the
    chunk boundary (shared dictionary)."""
    rng = random.Random(1414)
    words = [b"alpha", b"beta", b"gamma", b"delta12345", b"\x00\xff"]
    data = b"".join(
        rng.choice(words) * rng.randrange(1, 9) for _ in range(400_000)
    )
    assert len(data) > 4 * 1024 * 1024
    blob = _real_encode(data, "-6")
    assert xz_decompress(blob) == data


def test_error_paths() -> None:
    good = bytearray(xz_compress_stored(b"payload" * 50, check="crc64"))
    with pytest.raises(XzError, match="too short"):
        xz_decompress(b"\xfd7zXZ\x00")
    with pytest.raises(XzError, match="magic"):
        xz_decompress(b"not an xz stream" + bytes(good)[16:])
    # flip a plaintext byte inside the uncompressed chunk -> check fails
    bad = good[:]
    bad[30] ^= 0x40
    with pytest.raises(XzError, match="check mismatch"):
        xz_decompress(bytes(bad))
    # corrupt the stream-flags CRC
    bad = good[:]
    bad[9] ^= 1
    with pytest.raises(XzError, match="header CRC32"):
        xz_decompress(bytes(bad))
    # truncation mid-block
    with pytest.raises(XzError):
        xz_decompress(bytes(good[:40]))
    # corrupt the footer magic
    bad = good[:]
    bad[-1] ^= 0xFF
    with pytest.raises(XzError, match="footer magic"):
        xz_decompress(bytes(bad))
    # index record tampering is caught by the index CRC32 first
    bad = good[:]
    bad[-18] ^= 0x01
    with pytest.raises(XzError):
        xz_decompress(bytes(bad))


def test_first_chunk_must_reset_dictionary() -> None:
    # hand-build a block whose first LZMA2 chunk uses control 0x02
    blob = bytearray(xz_compress_stored(b"abcdef", check="none"))
    pos = 12  # stream header
    hdr_size = (blob[pos] + 1) * 4
    ctrl_at = pos + hdr_size
    assert blob[ctrl_at] == 0x01
    blob[ctrl_at] = 0x02
    with pytest.raises(XzError, match="must reset the dictionary"):
        xz_decompress(bytes(blob))
