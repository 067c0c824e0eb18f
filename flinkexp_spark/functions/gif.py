"""Pure-python GIF codec — REAL LZW-compressed image decode for X5.

Completes the lossless-image pair started by functions/png.py: GIF is the
other ubiquitous palette-image format in crawled corpora, and like PNG,
FLAC and ADPCM (and unlike MP3/Vorbis — see functions/flac.py:9) every
constant it needs is derivable from the public specification (GIF89a,
CompuServe 1990 / W3C mirror):

* the Logical Screen Descriptor / Image Descriptor byte layouts;
* variable-width LZW with a code table REBUILT FROM THE STREAM ITSELF —
  clear code = 2^min_code_size, end code = clear + 1, widths grow
  4..12 bits, codes packed LSB-first into 255-byte-max sub-blocks;
* the 4-pass interlace row order (rows 0,8,.. then 4,12,.. then 2,6,..
  then 1,3,..).

Scope handled: single-frame GIF87a/GIF89a, global and local color
tables, interlaced and progressive row order, extension blocks skipped
per spec framing (so streams with Graphic Control / comment extensions
still decode), LZW code-width growth through the full 12-bit range and
mid-stream CLEAR handling.  The encoder writes real LZW (dictionary
build, width bumps, clear-on-full) so fixtures exercise the same paths
a crawled GIF would.  Animation (multiple image blocks) reports frame
count; pixel decode targets the first frame, raising loudly beyond it.

Reference parity: the reference repo's scope is the query engine
(StreamSocket.scala:15-16); the multimodal-column brief drives this.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# 4-pass interlace: (row_start, row_step) per pass — spec appendix E.
INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

MAX_CODE_WIDTH = 12


class GifError(ValueError):
    """Malformed or unsupported GIF stream."""


# ---------------------------------------------------------------------------
# LZW (variable-width, LSB-first bit packing)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """Decode a GIF LZW stream to ``expected`` palette indices."""
    if not 2 <= min_code_size <= 8:
        raise GifError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1

    out = np.empty(expected, dtype=np.uint8)
    n_out = 0
    # the code table maps code -> byte string; rebuilt on CLEAR
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None

    bitbuf = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GifError("LZW stream ended before END code")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifError(f"first code {code} not in initial table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError(f"LZW code {code} beyond table size {len(table)}")
        if n_out + len(entry) > expected:
            raise GifError("LZW output exceeds image size")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        prev = entry
        # width bump: when the NEXT code to be assigned no longer fits.
        # At 12 bits the table freezes until a CLEAR (spec behaviour).
        if len(table) == (1 << width) and width < MAX_CODE_WIDTH:
            width += 1
    if n_out != expected:
        raise GifError(f"LZW produced {n_out} of {expected} pixels")
    return out


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Encode palette indices as a GIF LZW stream (with a leading CLEAR,
    clear-on-table-full, and a trailing END, per spec)."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    # Width bumps must mirror the DECODER's table growth, which appends
    # one entry for every real code from the second onward — including
    # the final flush code, for which the encoder assigns nothing.  So
    # dec_len (the decoder's table size) drives the width, while
    # next_code only tracks the encoder's own dictionary.
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    dec_len = end + 1
    started = False  # a real code was emitted since the last CLEAR
    emit(clear, width)

    def emit_real(code: int) -> None:
        nonlocal dec_len, width, started
        emit(code, width)
        if started:  # decoder appends after every non-first real code
            dec_len += 1
            if dec_len == (1 << width) and width < MAX_CODE_WIDTH:
                width += 1
        started = True

    seq = b""
    for b in bytes(indices.astype(np.uint8).tobytes()):
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit_real(table[seq])
        if next_code < (1 << MAX_CODE_WIDTH):
            table[cand] = next_code
            next_code += 1
        else:  # table full: clear and restart (exercises decoder CLEAR)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
            dec_len = end + 1
            started = False
        seq = bytes([b])
    if seq:
        emit_real(table[seq])
    emit(end, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    """Frame ``data`` into <=255-byte length-prefixed sub-blocks + 0."""
    out = bytearray()
    for i in range(0, len(data), 255):
        piece = data[i : i + 255]
        out.append(len(piece))
        out += piece
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise GifError("truncated sub-block")
        out += data[pos : pos + n]
        pos += n


def _interlace_order(height: int) -> np.ndarray:
    """Source-row -> display-row mapping for interlaced images."""
    rows = []
    for start, step in INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return np.asarray(rows, dtype=np.int64)


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    local_palette: bool = False,
) -> bytes:
    """Encode a (H, W) uint8 index image + (N, 3) palette as GIF89a.
    ``local_palette`` stores the table on the image descriptor instead of
    the logical screen (both layouts appear in the wild)."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or idx.shape[0] == 0 or idx.shape[1] == 0:
        raise GifError(f"bad index array shape {idx.shape}")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 2 <= len(pal) <= 256:
        raise GifError(f"bad palette shape {pal.shape}")
    if int(idx.max()) >= len(pal):
        raise GifError("palette index out of range")
    h, w = idx.shape
    # color table sizes are powers of two: pad up, field stores log2-1
    size_field = max(1, (len(pal) - 1).bit_length() - 1)
    n_slots = 2 << size_field
    if n_slots < len(pal):
        size_field += 1
        n_slots = 2 << size_field
    pal_bytes = pal.tobytes() + b"\x00" * (3 * (n_slots - len(pal)))
    mcs = max(2, size_field + 1)  # LZW min code size

    out = bytearray(b"GIF89a")
    gct_flag = 0 if local_palette else 0x80
    out += struct.pack("<HHBBB", w, h, gct_flag | size_field, 0, 0)
    if not local_palette:
        out += pal_bytes
    # a Graphic Control Extension — real-world streams carry these; the
    # decoder must skip it by sub-block framing
    out += b"\x21\xf9" + _sub_blocks(struct.pack("<BHB", 0, 0, 0))
    lct_flag = 0x80 if local_palette else 0
    ilace_flag = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, lct_flag | ilace_flag | size_field
    )
    if local_palette:
        out += pal_bytes
    if interlace:
        rows = idx[_interlace_order(h)]
    else:
        rows = idx
    out.append(mcs)
    out += _sub_blocks(lzw_encode(rows.reshape(-1), mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode the first frame of a GIF to ((H, W, 3) uint8 RGB, meta).

    Walks the full container (header, logical screen, color tables,
    extension blocks by sub-block framing), LZW-decodes the image data,
    undoes 4-pass interlacing, and expands through the active (local or
    global) color table.  Truncation, bad magic, missing color tables,
    LZW overruns and out-of-range indices all raise GifError.
    """
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if data[:6] not in GIF_MAGICS:
        raise GifError("bad GIF signature")
    if len(data) < 13:
        raise GifError("truncated logical screen descriptor")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise GifError("truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            -1, 3
        )
        pos += 3 * n

    img = None
    meta: dict = {"screen_width": sw, "screen_height": sh, "n_frames": 0}
    while True:
        if pos >= len(data):
            raise GifError("missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise GifError("truncated extension")
            pos += 1  # label
            _, pos = _read_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise GifError(f"unknown block type 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", data[pos : pos + 9]
        )
        pos += 9
        lct = None
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise GifError("truncated local color table")
            lct = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * n
        if pos >= len(data):
            raise GifError("truncated image data")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        meta["n_frames"] += 1
        if meta["n_frames"] > 1:
            continue  # count additional frames; decode only the first
        if w == 0 or h == 0:
            raise GifError("zero-dimension image")
        idx = lzw_decode(lzw, mcs, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: invert the 4-pass row order
            disp = np.empty_like(idx)
            disp[_interlace_order(h)] = idx
            idx = disp
        table = lct if lct is not None else gct
        if table is None:
            raise GifError("image has no color table")
        if int(idx.max()) >= len(table):
            raise GifError("palette index out of range")
        img = table[idx]
        meta.update(
            width=w,
            height=h,
            left=left,
            top=top,
            interlace=bool(ipacked & 0x40),
            local_palette=lct is not None,
            palette_size=int(len(table)),
        )
    if img is None:
        raise GifError("no image block before trailer")
    return img, meta
