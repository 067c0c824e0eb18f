"""From-spec TIFF 6.0 baseline reader with LZW (Compression=5) strips.

Everything here is derived from the PUBLIC TIFF 6.0 specification
(Adobe, 1992) — no imaging library anywhere:

* classic header (``II*\\0`` / ``MM\\0*``), IFD walk with typed entries
  (SHORT/LONG, inline vs offset values), both byte orders
* strip assembly: StripOffsets / StripByteCounts / RowsPerStrip
* the TIFF **variant** of LZW (spec §13): MSB-first bit packing, fixed
  256-symbol alphabet with ClearCode=256 / EndOfInformation=257, and the
  "early change" quirk — the code width bumps when the NEXT code to be
  assigned is ``2^width - 1`` (one code earlier than GIF's LSB-first
  variant in functions/gif.py), table reset at code 4094
* Predictor=2 horizontal differencing undo (spec §14)

The LZW ENCODER here exists for fixture synthesis only (this container
has no stdlib writer); both directions are pinned to hand-computed
spec-rule bit patterns in tests/test_tiff_lzw.py, so encoder and decoder
are each anchored to the spec text, not merely to each other.
"""

from __future__ import annotations

import struct

import numpy as np

_CLEAR = 256
_EOI = 257
_MAX_WIDTH = 12
_TABLE_RESET_AT = 4094  # spec: emit Clear when the next code would be 4094


class TiffError(ValueError):
    """Malformed or unsupported TIFF payload."""


# ---------------------------------------------------------------------------
# LZW, TIFF variant (MSB-first, early change)
# ---------------------------------------------------------------------------

def lzw_msb_decode(data: bytes) -> bytes:
    """Decode one TIFF-LZW strip.  Spec §13: codes are packed MSB-first;
    the width grows from 9 when the next code to be ASSIGNED equals
    2^width - 1 (early change); Clear resets table and width; EOI ends."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= n:
                raise TiffError("LZW strip ended before EndOfInformation")
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (bitbuf >> nbits) & ((1 << width) - 1)
        bitbuf &= (1 << nbits) - 1
        if code == _CLEAR:
            reset()
            continue
        if code == _EOI:
            return bytes(out)
        if prev is None:
            if code >= 256:
                raise TiffError(f"first code after Clear is {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffError(f"LZW code {code} beyond table of {len(table)}")
        out += entry
        prev = entry
        # early change: bump when the NEXT code to be assigned tops out
        # one below the width's capacity (TIFF quirk vs GIF)
        if len(table) == (1 << width) - 1 and width < _MAX_WIDTH:
            width += 1


def lzw_msb_encode(data: bytes) -> bytes:
    """Spec-rule TIFF-LZW encoder (fixture synthesis): Clear first, string
    table growth, Clear again when the table reaches code 4094, EOI last.

    Width handling mirrors the DECODER's table state explicitly (the same
    dec_len technique as functions/gif.py): the decoder assigns its first
    entry only on the SECOND code after a Clear, so its table runs one
    entry behind the encoder's — tracking dec_len and bumping when it
    reaches 2^width - 1 (early change) keeps every emission at exactly
    the width the decoder will read it with."""
    bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    dec_len = 258
    emitted_since_clear = 0
    bits.append((_CLEAR, width))

    def emit(code: int) -> None:
        nonlocal width, dec_len, emitted_since_clear
        bits.append((code, width))
        emitted_since_clear += 1
        if emitted_since_clear >= 2:  # decoder adds from its 2nd code on
            dec_len += 1
            if dec_len == (1 << width) - 1 and width < _MAX_WIDTH:
                width += 1

    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        if next_code == _TABLE_RESET_AT:
            bits.append((_CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            dec_len = 258
            emitted_since_clear = 0
        w = c
    if w:
        emit(table[w])
    bits.append((_EOI, width))
    # pack MSB-first
    buf = bytearray()
    acc = 0
    nacc = 0
    for code, wd in bits:
        acc = (acc << wd) | code
        nacc += wd
        while nacc >= 8:
            nacc -= 8
            buf.append((acc >> nacc) & 0xFF)
            acc &= (1 << nacc) - 1
    if nacc:
        buf.append((acc << (8 - nacc)) & 0xFF)
    return bytes(buf)


# ---------------------------------------------------------------------------
# Container: classic TIFF, grayscale 8-bit, LZW strips, Predictor 1/2
# ---------------------------------------------------------------------------

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PREDICTOR = 317

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def tiff_encode_gray(
    pixels: np.ndarray,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    big_endian: bool = False,
) -> bytes:
    """Minimal spec-correct writer (fixture synthesis): one 8-bit gray
    image, LZW-compressed strips, optional horizontal differencing."""
    h, w = pixels.shape
    rps = h if rows_per_strip is None else rows_per_strip
    e = ">" if big_endian else "<"
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        block = pixels[y0 : y0 + rps].astype(np.int64)
        if predictor == 2:
            block = np.concatenate(
                [block[:, :1], np.diff(block, axis=1)], axis=1
            ) % 256
        strips.append(lzw_msb_encode(block.astype(np.uint8).tobytes()))
    n_strips = len(strips)
    # layout: header(8) | strip data | offsets array | counts array | IFD
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    if n_strips > 1:
        off_array_pos, pos = pos, pos + 4 * n_strips
        cnt_array_pos, pos = pos, pos + 4 * n_strips
    ifd_pos = pos

    def entry(tag: int, typ: int, count: int, value: int) -> tuple[int, bytes]:
        if typ == 3 and count == 1:  # SHORT packs left-justified
            return tag, struct.pack(f"{e}HHI", tag, typ, count) + struct.pack(
                f"{e}HH", value, 0
            )
        return tag, struct.pack(f"{e}HHII", tag, typ, count, value)

    tags = [
        entry(_TAG_WIDTH, 3, 1, w),
        entry(_TAG_LENGTH, 3, 1, h),
        entry(_TAG_BITS, 3, 1, 8),
        entry(_TAG_COMPRESSION, 3, 1, 5),  # LZW
        entry(_TAG_PHOTOMETRIC, 3, 1, 1),  # BlackIsZero
        entry(
            _TAG_STRIP_OFFSETS,
            4,
            n_strips,
            offsets[0] if n_strips == 1 else off_array_pos,
        ),
        entry(_TAG_SPP, 3, 1, 1),
        entry(_TAG_ROWS_PER_STRIP, 3, 1, rps),
        entry(
            _TAG_STRIP_COUNTS,
            4,
            n_strips,
            len(strips[0]) if n_strips == 1 else cnt_array_pos,
        ),
        entry(_TAG_PREDICTOR, 3, 1, predictor),
    ]
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(f"{e}HI", 42, ifd_pos)
    for s in strips:
        out += s
    if n_strips > 1:
        for o in offsets:
            out += struct.pack(f"{e}I", o)
        for s in strips:
            out += struct.pack(f"{e}I", len(s))
    out += struct.pack(f"{e}H", len(tags))
    # IFD entries must be sorted by NUMERIC tag (spec).  Sorting the packed
    # bytes would order little-endian output by the tag's LOW byte — only
    # accidentally correct while every tag shares high byte 0x01.
    for _, t in sorted(tags):
        out += t
    out += struct.pack(f"{e}I", 0)  # no next IFD
    return bytes(out)


def _read_ifd_values(
    data: bytes, e: str, typ: int, count: int, raw: bytes
) -> list[int]:
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise TiffError(f"unsupported IFD entry type {typ}")
    total = size * count
    if total <= 4:
        blob = raw[:total]
    else:
        (off,) = struct.unpack(f"{e}I", raw)
        blob = data[off : off + total]
        if len(blob) != total:
            raise TiffError("IFD value block out of file bounds")
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt is None:
        raise TiffError(f"unsupported value type {typ}")
    return list(struct.unpack(f"{e}{count}{fmt}", blob))


def tiff_decode_gray(data: bytes) -> np.ndarray:
    """Read the first IFD of a classic TIFF: 8-bit grayscale, LZW strips,
    Predictor 1 or 2, either byte order.  Returns an (h, w) uint8 array."""
    if len(data) < 8:
        raise TiffError("file shorter than the TIFF header")
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise TiffError(f"bad byte-order mark {data[:2]!r}")
    magic, ifd_pos = struct.unpack(f"{e}HI", data[2:8])
    if magic != 42:
        raise TiffError(f"bad magic {magic} (classic TIFF is 42)")
    if ifd_pos + 2 > len(data):
        raise TiffError("IFD offset beyond end of file")
    (n_entries,) = struct.unpack(f"{e}H", data[ifd_pos : ifd_pos + 2])
    if ifd_pos + 2 + 12 * n_entries > len(data):
        raise TiffError("truncated IFD entry table")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_pos + 2 + 12 * i
        tag, typ, count = struct.unpack(f"{e}HHI", data[base : base + 8])
        tags[tag] = _read_ifd_values(data, e, typ, count, data[base + 8 : base + 12])
    try:
        w = tags[_TAG_WIDTH][0]
        h = tags[_TAG_LENGTH][0]
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]
    except KeyError as k:
        raise TiffError(f"required tag missing: {k}") from None
    if tags.get(_TAG_BITS, [8])[0] != 8 or tags.get(_TAG_SPP, [1])[0] != 1:
        raise TiffError("only 8-bit single-sample images supported")
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp != 5:
        raise TiffError(f"compression {comp} unsupported (LZW=5 only)")
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise TiffError(f"predictor {predictor} unsupported")
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
    if len(offsets) != len(counts):
        raise TiffError("StripOffsets/StripByteCounts length mismatch")
    img = np.zeros((h, w), dtype=np.uint8)
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rps, h - i * rps)
        if rows <= 0:
            raise TiffError("more strips than image rows")
        raw = lzw_msb_decode(data[off : off + cnt])
        if len(raw) != rows * w:
            raise TiffError(
                f"strip {i} decodes to {len(raw)} bytes, want {rows * w}"
            )
        block = np.frombuffer(raw, dtype=np.uint8).reshape(rows, w)
        if predictor == 2:
            block = np.cumsum(block.astype(np.int64), axis=1) % 256
        img[i * rps : i * rps + rows] = block.astype(np.uint8)
    covered = min(len(offsets) * rps, h) if rps else 0
    if covered < h:  # under-declared strip table must not yield zero rows
        raise TiffError(
            f"strips cover only {covered} of {h} rows "
            f"({len(offsets)} strips at {rps} rows/strip)"
        )
    return img
