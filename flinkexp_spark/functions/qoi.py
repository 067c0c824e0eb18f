"""QOI (Quite OK Image) codec — pure Python/numpy, from the public spec.

Extends the "real codec, exact oracle" family (functions/png.py for
DEFLATE+filters, functions/apng.py for stateful animation compositing,
functions/g711.py for companding audio) with the 2021 single-page image
format: QOI is byte-aligned LZ-adjacent coding with SIX chunk ops —

  QOI_OP_RGB   (0xFE + 3 bytes)  absolute color, alpha carried over
  QOI_OP_RGBA  (0xFF + 4 bytes)  absolute color with alpha
  QOI_OP_INDEX (0b00xxxxxx)      back-reference into a 64-slot running
                                 hash table, hash = (3r+5g+7b+11a) % 64
  QOI_OP_DIFF  (0b01drdgdb)      per-channel delta in [-2, 1], bias 2,
                                 wrapping mod 256
  QOI_OP_LUMA  (0b10dddddd ..)   green delta in [-32, 31] plus red/blue
                                 deltas RELATIVE TO GREEN in [-8, 7]
  QOI_OP_RUN   (0b11xxxxxx)      repeat previous pixel 1..62 times
                                 (lengths 63/64 reserved: those tag bytes
                                 are QOI_OP_RGB/RGBA)

Why QOI clears the no-literal-tables bar trivially: the format has NO
tables at all — the whole spec is the op grammar above plus the running
index hash, both restated here from the published one-pager
(qoiformat.org/qoi-specification.pdf, CC0).  Nothing is transcribed from
any implementation.

Decoding is inherently SEQUENTIAL per image (the 64-slot index and the
previous-pixel register are chain state), which is exactly the shape the
engine's multimodal contract expects: per-row independent work inside
Arrow ``mapInPandas`` batches — embarrassingly parallel across documents,
no shuffle, 100 TB-safe (SCALING.md X5).

The paired DuckDB oracle does NOT replay the bitstream (a 64-slot LRU-ish
hash table inside SQL would be a recursive-CTE contortion, not a check);
instead the FIXTURE synthesizes pixels from a closed-form delta chain
(catalog/llm_multimodal.py::with_qoi_payload) and encodes them — the
synthesized artifact is the BITSTREAM; the pixels only exist by decoding.
The oracle recomputes the pixels as window algebra (last-jump grouping +
per-group prefix sums, mod 256) and pins byte order via a position
checksum, so the decode is verified end-to-end by an independent engine.

Reference parity: the reference repo declares its media path only through
the study/pom.xml dependency envelope (no codec code of its own); this is
public-spec work implemented Spark-first.
"""

from __future__ import annotations

import struct

import numpy as np

QOI_MAGIC = b"qoif"
QOI_END = b"\x00" * 7 + b"\x01"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF
_MASK2 = 0xC0


class QoiError(ValueError):
    """Malformed QOI stream (bad magic, short stream, pixel overrun)."""


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(
    pixels: np.ndarray, channels: int = 3, colorspace: int = 0
) -> bytes:
    """Encode an (h, w, channels) uint8 array to a QOI byte stream.

    Greedy op selection in spec priority order: RUN (while the pixel
    repeats, capped at 62), then INDEX (hash-slot hit), then — alpha
    unchanged — DIFF if every wrapped delta fits [-2, 1], LUMA if the
    green delta fits [-32, 31] with red/blue-vs-green in [-8, 7], else
    RGB; an alpha change forces RGBA.
    """
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise QoiError(f"pixels must be (h, w, 3|4), got {pixels.shape}")
    if channels not in (3, 4):
        raise QoiError(f"channels must be 3 or 4, got {channels}")
    h, w, pc = pixels.shape
    out = bytearray()
    out += QOI_MAGIC
    out += struct.pack(">IIBB", w, h, channels, colorspace)

    flat = pixels.reshape(-1, pc).astype(np.int64)
    if pc == 3:
        flat = np.concatenate(
            [flat, np.full((flat.shape[0], 1), 255, dtype=np.int64)], axis=1
        )
    index = np.zeros((64, 4), dtype=np.int64)  # spec: zero-initialized
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for r, g, b, a in flat:
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        hidx = _hash(r, g, b, a)
        if tuple(index[hidx]) == (r, g, b, a):
            out.append(_OP_INDEX | hidx)
        else:
            index[hidx] = (r, g, b, a)
            if a == pa:
                # wrapped signed deltas: ((x + 128) % 256) - 128
                dr = ((r - pr + 128) % 256) - 128
                dg = ((g - pg + 128) % 256) - 128
                db = ((b - pb + 128) % 256) - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        _OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(_OP_LUMA | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out.append(_OP_RGB)
                    out += bytes((r, g, b))
            else:
                out.append(_OP_RGBA)
                out += bytes((r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(_OP_RUN | (run - 1))
    out += QOI_END
    return bytes(out)


def decode_qoi(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a QOI stream to (width, height, channels, (h*w, 4) uint8).

    Cross-checks: magic, header geometry, exact pixel-count termination
    (a stream whose chunks decode to more or fewer than w*h pixels is
    rejected), and the 8-byte end marker.
    """
    if len(data) < 14 + len(QOI_END):
        raise QoiError(f"stream too short: {len(data)} bytes")
    if data[:4] != QOI_MAGIC:
        raise QoiError(f"bad magic {data[:4]!r}")
    w, h, channels, colorspace = struct.unpack(">IIBB", data[4:14])
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise QoiError(f"bad header: channels={channels} cs={colorspace}")
    if data[-len(QOI_END):] != QOI_END:
        raise QoiError("missing end marker")
    chunks = data[14 : -len(QOI_END)]

    n_px = w * h
    out = np.zeros((n_px, 4), dtype=np.uint8)
    index = np.zeros((64, 4), dtype=np.int64)
    r, g, b, a = 0, 0, 0, 255
    p = 0  # chunk cursor
    i = 0  # pixel cursor
    while i < n_px:
        if p >= len(chunks):
            raise QoiError(f"pixel underrun: {i}/{n_px} decoded")
        b1 = chunks[p]
        p += 1
        if b1 == _OP_RGB:
            if p + 3 > len(chunks):
                raise QoiError(f"truncated RGB op at byte {p}")
            r, g, b = chunks[p], chunks[p + 1], chunks[p + 2]
            p += 3
        elif b1 == _OP_RGBA:
            if p + 4 > len(chunks):
                raise QoiError(f"truncated RGBA op at byte {p}")
            r, g, b, a = chunks[p], chunks[p + 1], chunks[p + 2], chunks[p + 3]
            p += 4
        elif b1 & _MASK2 == _OP_INDEX:
            r, g, b, a = index[b1 & 0x3F]
        elif b1 & _MASK2 == _OP_DIFF:
            r = (r + ((b1 >> 4) & 0x03) - 2) % 256
            g = (g + ((b1 >> 2) & 0x03) - 2) % 256
            b = (b + (b1 & 0x03) - 2) % 256
        elif b1 & _MASK2 == _OP_LUMA:
            if p >= len(chunks):
                raise QoiError(f"truncated LUMA op at byte {p}")
            b2 = chunks[p]
            p += 1
            dg = (b1 & 0x3F) - 32
            r = (r + dg + ((b2 >> 4) & 0x0F) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (b2 & 0x0F) - 8) % 256
        else:  # _OP_RUN
            run = (b1 & 0x3F) + 1
            if i + run > n_px:
                raise QoiError(f"run overruns image: {i}+{run} > {n_px}")
            out[i : i + run] = (r, g, b, a)
            i += run
            index[_hash(r, g, b, a)] = (r, g, b, a)
            continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if p != len(chunks):
        raise QoiError(f"{len(chunks) - p} trailing chunk bytes after w*h pixels")
    return w, h, channels, out


def op_histogram(data: bytes) -> dict[str, int]:
    """Count chunk ops in a QOI stream (test/coverage instrumentation).

    Walks the chunk grammar without maintaining pixel state — op lengths
    are fully determined by tag bytes.
    """
    if data[:4] != QOI_MAGIC or data[-len(QOI_END):] != QOI_END:
        raise QoiError("not a QOI stream")
    chunks = data[14 : -len(QOI_END)]
    counts = {"rgb": 0, "rgba": 0, "index": 0, "diff": 0, "luma": 0, "run": 0}
    p = 0
    while p < len(chunks):
        b1 = chunks[p]
        p += 1
        if b1 == _OP_RGB:
            counts["rgb"] += 1
            p += 3
        elif b1 == _OP_RGBA:
            counts["rgba"] += 1
            p += 4
        elif b1 & _MASK2 == _OP_INDEX:
            counts["index"] += 1
        elif b1 & _MASK2 == _OP_DIFF:
            counts["diff"] += 1
        elif b1 & _MASK2 == _OP_LUMA:
            counts["luma"] += 1
            p += 1
        else:
            counts["run"] += 1
    return counts


def closed_chain_pixels(
    doc_id: int, text: str, dim_mod: int = 25, dim_min: int = 8
) -> tuple[int, int, int, "np.ndarray"]:
    """(w, h, channels, (h, w, channels) uint8) — the engine fixture's
    closed-form pixel chain (palette jumps + DIFF/LUMA-range deltas + runs),
    designed so every QOI chunk op is live and a SQL oracle can recompute
    the pixels as last-jump window algebra (catalog/llm_multimodal.py
    ``multimodal_decode_qoi_pixels``).  Lives here, not in multimodal.py,
    so worker closures ship it BY VALUE with the codec.

    Every 4th doc (doc_id % 4 == 0) is RGBA: its alpha is constant between
    jumps and changes AT each palette jump (alpha = 200 + 10*k for palette
    slot k), which forces the encoder through QOI_OP_RGBA.
    """
    import hashlib

    d = hashlib.md5(text.encode("utf-8")).digest()
    s, s2 = d[0], d[1]
    w = len(text) % dim_mod + dim_min
    h = (3 * len(text) + doc_id) % dim_mod + dim_min
    n = w * h
    i = np.arange(n, dtype=np.int64)
    md = (s + 13 * i + i * i) % 8
    is_jump = (md >= 5) | (i == 0)
    dg_luma = (s + 7 * i) % 64 - 32
    delta = np.zeros((n, 3), dtype=np.int64)
    diff = md == 3
    delta[diff, 0] = (s + i[diff]) % 4 - 2
    delta[diff, 1] = (s2 + i[diff]) % 4 - 2
    delta[diff, 2] = i[diff] % 4 - 2
    luma = md == 4
    delta[luma, 0] = dg_luma[luma] + (i[luma] % 16 - 8)
    delta[luma, 1] = dg_luma[luma]
    delta[luma, 2] = dg_luma[luma] + ((s2 + i[luma]) % 16 - 8)
    delta[is_jump] = 0
    # last-jump grouping: grp[i] = max jump position <= i
    grp = np.maximum.accumulate(np.where(is_jump, i, -1))
    pal_k = (s2 + grp) % 4
    base = (5 * s + 47 * pal_k[:, None] + 31 * np.arange(3)[None, :]) % 256
    cs = np.cumsum(delta, axis=0)
    px = (base + cs - cs[grp]) % 256
    channels = 4 if doc_id % 4 == 0 else 3
    if channels == 4:
        alpha = 200 + 10 * pal_k  # constant between jumps, changes at them
        px = np.concatenate([px, alpha[:, None]], axis=1)
    return w, h, channels, px.astype(np.uint8).reshape(h, w, channels)
