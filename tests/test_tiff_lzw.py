"""From-spec TIFF 6.0 + LZW (functions/tiff.py).

No TIFF/LZW reference implementation exists in this environment (no PIL /
tifffile / imageio), so the anchoring strategy differs from the zlib/bz2
parity suites: the code sequences for small inputs are derived BY HAND
from the spec's string-table rules and written out code-by-code here —
the encoder must produce exactly those bit patterns and the decoder must
invert them, pinning each side to the spec text rather than merely to
each other.  Larger inputs are covered by roundtrips that cross every
width boundary (511/1023/2047, early change) and the 4094 table reset.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from flinkexp_spark.functions.tiff import (
    TiffError,
    lzw_msb_decode,
    lzw_msb_encode,
    tiff_decode_gray,
    tiff_encode_gray,
)


def _pack_msb(seq: list[tuple[int, int]]) -> bytes:
    """Independent MSB-first packer for the hand-listed (code, width)
    sequences — deliberately NOT the implementation under test."""
    acc = nacc = 0
    out = bytearray()
    for code, wd in seq:
        acc = (acc << wd) | code
        nacc += wd
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
            acc &= (1 << nacc) - 1
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def test_hand_derived_spec_vector_ababab() -> None:
    """'ABABABA': Clear, A, B, [AB]=258, [ABA]=260, EOI — all 9-bit.
    Derived by hand from the spec's table-growth rules: AB->258, BA->259,
    ABA->260; the final w='ABA' emits 260."""
    seq = [(256, 9), (65, 9), (66, 9), (258, 9), (260, 9), (257, 9)]
    blob = _pack_msb(seq)
    assert lzw_msb_encode(b"ABABABA") == blob
    assert lzw_msb_decode(blob) == b"ABABABA"


def test_hand_derived_kwkwk_case() -> None:
    """'AAAA': Clear, A, 258, A, EOI — code 258 arrives BEFORE the decoder
    has table entry 258 (the KwKwK case: entry = prev + prev[0])."""
    seq = [(256, 9), (65, 9), (258, 9), (65, 9), (257, 9)]
    blob = _pack_msb(seq)
    assert lzw_msb_encode(b"AAAA") == blob
    assert lzw_msb_decode(blob) == b"AAAA"


def test_lzw_roundtrip_across_width_boundaries() -> None:
    """Inputs long enough to cross the 9->10->11->12 early-change bumps
    and (at 200k random bytes) several 4094-entry table resets."""
    rng = random.Random(20260816)
    for n in (0, 1, 2, 300, 5000, 60000, 200_000):
        for data in (
            bytes(rng.randrange(256) for _ in range(n)),
            bytes(((i // 9) * 13) % 256 for i in range(n)),
            b"\x07" * n,
        ):
            assert lzw_msb_decode(lzw_msb_encode(data)) == data


def test_container_roundtrip_all_layouts() -> None:
    """Both byte orders, single and multi strip, predictor 1 and 2,
    including a strip height that does not divide the image height."""
    cases = [
        (16, 16, None, 1, False),
        (33, 47, 8, 2, False),
        (20, 31, 7, 2, True),
        (1, 1, None, 1, False),
        (64, 64, 64, 2, True),
    ]
    for h, w, rps, pred, be in cases:
        px = np.array(
            [[(3 * x + 7 * y + (x * y) % 5) % 256 for x in range(w)]
             for y in range(h)],
            dtype=np.uint8,
        )
        blob = tiff_encode_gray(
            px, rows_per_strip=rps, predictor=pred, big_endian=be
        )
        assert np.array_equal(tiff_decode_gray(blob), px), (h, w, rps, pred, be)


def test_error_paths() -> None:
    px = np.zeros((4, 4), dtype=np.uint8)
    good = bytearray(tiff_encode_gray(px))
    with pytest.raises(TiffError, match="byte-order"):
        tiff_decode_gray(b"XX" + bytes(good[2:]))
    with pytest.raises(TiffError, match="magic"):
        tiff_decode_gray(b"II\x2b\x00" + bytes(good[4:]))  # BigTIFF mark
    with pytest.raises(TiffError, match="header"):
        tiff_decode_gray(b"II*\x00")
    # truncated strip: LZW must hit end-of-data before EOI
    short = bytes(good[:-14])  # IFD is at the tail; drop into it instead
    with pytest.raises(TiffError):
        tiff_decode_gray(short)
    # uncompressed files are explicitly out of scope for this reader
    blob = bytearray(tiff_encode_gray(px))
    # flip the Compression tag value (5 -> 1): find the entry and patch
    idx = bytes(blob).find(b"\x03\x01\x03\x00\x01\x00\x00\x00\x05\x00")
    assert idx > 0
    blob[idx + 8] = 1
    with pytest.raises(TiffError, match="compression 1|unsupported"):
        tiff_decode_gray(bytes(blob))


def _ifd_entries(blob: bytes) -> tuple[int, str, list[tuple[int, int]]]:
    """Parse (ifd_pos, endian, [(tag, entry_offset), ...]) from a TIFF."""
    import struct

    e = ">" if blob[:2] == b"MM" else "<"
    (ifd_pos,) = struct.unpack(f"{e}I", blob[4:8])
    (n,) = struct.unpack(f"{e}H", blob[ifd_pos : ifd_pos + 2])
    out = []
    for i in range(n):
        base = ifd_pos + 2 + 12 * i
        (tag,) = struct.unpack(f"{e}H", blob[base : base + 2])
        out.append((tag, base))
    return ifd_pos, e, out


@pytest.mark.parametrize("big_endian", [False, True])
def test_ifd_sorted_by_numeric_tag(big_endian: bool) -> None:
    """IFD entries must be ordered by NUMERIC tag in both byte orders —
    sorting packed little-endian bytes orders by the LOW byte and only
    works by accident while all tags share high byte 0x01 (r13 ADVICE)."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = tiff_encode_gray(img, rows_per_strip=3, big_endian=big_endian)
    _, _, entries = _ifd_entries(blob)
    tag_seq = [t for t, _ in entries]
    assert tag_seq == sorted(tag_seq)
    assert np.array_equal(tiff_decode_gray(blob), img)


def test_strip_undercoverage_raises_not_zeros() -> None:
    """An IFD that declares fewer strips than ceil(h/rps) must raise, not
    silently leave the uncovered rows zero (r13 ADVICE)."""
    import struct

    rng = random.Random(7)
    img = np.array(
        [[rng.randrange(1, 256) for _ in range(16)] for _ in range(8)],
        dtype=np.uint8,
    )
    blob = bytearray(tiff_encode_gray(img, rows_per_strip=2))  # 4 strips
    _, e, entries = _ifd_entries(bytes(blob))
    patched = 0
    for tag, base in entries:
        if tag in (273, 279):  # StripOffsets / StripByteCounts
            struct.pack_into(f"{e}I", blob, base + 4, 2)  # declare 2 strips
            patched += 1
    assert patched == 2
    with pytest.raises(TiffError, match="cover only 4 of 8 rows"):
        tiff_decode_gray(bytes(blob))
