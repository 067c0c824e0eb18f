"""IMA-ADPCM (DVI4) audio codec — pure Python/numpy, WAV container.

Extends the "real codec, exact oracle" family (functions/flac.py for
lossless audio, functions/jpeg.py for images) with a LOSSY-but-exactly-
replayable compressed-audio path: IMA-ADPCM as carried by WAV format tag
0x0011 (mono, 4-bit nibbles, per-block state headers + fact chunk).

Why IMA-ADPCM and not MP3/Vorbis: the perceptual codecs' specs make huge
literal constant tables normative (see functions/flac.py:9) — not
derivable offline.  IMA-ADPCM's entire normative data is an 8-entry index
adaptation table and an 89-entry step table that follows the published
~1.1x geometric staircase (IMA "Recommended Practices for Enhancing
Digital Audio Compatibility in Multimedia Systems", 1992 — public, and
reproduced in every multimedia reference since).  The decode state
machine is pure integer shift/add arithmetic, which means a DuckDB
oracle can replay the ENTIRE decoder as a recursive CTE — the official
query's oracle does exactly that, so correctness is checked end-to-end
by an independent engine, not by trusting this module.

Reference parity: the reference repo declares its media path only through
the study/pom.xml dependency envelope (no codec code of its own); this is
public-spec work implemented Spark-first — the decoder runs inside Arrow
``mapInPandas`` batches, one independent row at a time: embarrassingly
parallel, no shuffle, 100 TB-safe.
"""

from __future__ import annotations

import struct

import numpy as np

# IMA 1992 recommended practice, section "ADPCM step size table": an
# ~1.1x geometric staircase from 7 to 32767 (89 entries).  Small enough
# to carry verbatim; tests pin length, endpoints, monotonicity, and the
# published growth ratio.
STEP_TABLE: tuple[int, ...] = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)

# Index adaptation per nibble magnitude (sign bit ignored).
INDEX_TABLE: tuple[int, ...] = (-1, -1, -1, -1, 2, 4, 6, 8)

WAVE_FORMAT_IMA_ADPCM = 0x0011


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def decode_nibble(nib: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA decode step: (nibble, state) -> next (pred, index).

    Canonical shift/add form (NOT ``(2m+1)*step >> 4`` — truncation
    differs); the DuckDB oracle replays this exact arithmetic."""
    step = STEP_TABLE[index]
    vpdiff = step >> 3
    if nib & 4:
        vpdiff += step
    if nib & 2:
        vpdiff += step >> 1
    if nib & 1:
        vpdiff += step >> 2
    pred = _clamp16(pred - vpdiff if nib & 8 else pred + vpdiff)
    index = min(88, max(0, index + INDEX_TABLE[nib & 7]))
    return pred, index


def encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One IMA encode step -> (nibble, next_pred, next_index).

    The encoder tracks the DECODER's reconstruction (vpdiff accumulated
    with the same shifts), so encode->decode state chains are identical —
    the property the round-trip tests pin."""
    step = STEP_TABLE[index]
    diff = sample - pred
    nib = 8 if diff < 0 else 0
    diff = abs(diff)
    vpdiff = step >> 3
    if diff >= step:
        nib |= 4
        diff -= step
        vpdiff += step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
        vpdiff += step >> 1
    if diff >= step >> 2:
        nib |= 1
        vpdiff += step >> 2
    pred = _clamp16(pred - vpdiff if nib & 8 else pred + vpdiff)
    index = min(88, max(0, index + INDEX_TABLE[nib & 7]))
    return nib, pred, index


# --------------------------------------------------------------------------
# WAV (format 0x0011) container — mono.
# --------------------------------------------------------------------------

def _blocks_from_nibbles(
    headers: list[tuple[int, int]], nibbles: list[list[int]], block_align: int
) -> bytes:
    out = bytearray()
    for (pred, index), nibs in zip(headers, nibbles):
        if len(nibs) != (block_align - 4) * 2:
            raise ValueError("each block needs exactly (block_align-4)*2 nibbles")
        out += struct.pack("<hBB", pred, index, 0)
        for i in range(0, len(nibs), 2):
            out.append((nibs[i] & 0x0F) | ((nibs[i + 1] & 0x0F) << 4))
    return bytes(out)


def build_ima_wav(
    headers: list[tuple[int, int]],
    nibbles: list[list[int]],
    sample_rate: int,
    block_align: int = 36,
) -> bytes:
    """Assemble a mono WAV 0x0011 stream from per-block (pred, index)
    headers and nibble lists.  Used both by the real encoder below and by
    the fixture synthesis (which derives nibbles arithmetically so the
    SQL oracle can replay the decode)."""
    samples_per_block = (block_align - 4) * 2 + 1
    n_samples = samples_per_block * len(headers)
    data = _blocks_from_nibbles(headers, nibbles, block_align)
    byte_rate = sample_rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM,
        1,
        sample_rate,
        byte_rate,
        block_align,
        4,
        2,
        samples_per_block,
    )
    fact = struct.pack("<I", n_samples)
    out = bytearray(b"RIFF")
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    out += struct.pack("<I", len(body)) + body
    return bytes(out)


def encode_ima_wav(
    samples: np.ndarray, sample_rate: int, block_align: int = 36
) -> bytes:
    """REAL quantizing encoder: int16 mono samples -> WAV 0x0011.

    Per WAV-IMA block layout the header carries the block's first sample
    verbatim (plus the running step index); the remaining
    ``(block_align-4)*2`` samples quantize through :func:`encode_sample`.
    The tail is padded by repeating the last sample (the fact chunk
    records the true count)."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim != 1:
        raise ValueError("mono only: pass a 1-D int16 sample array")
    spb = (block_align - 4) * 2 + 1
    n = len(samples)
    if n == 0:
        raise ValueError("cannot encode an empty stream")
    n_blocks = (n + spb - 1) // spb
    padded = np.concatenate([samples, np.full(n_blocks * spb - n, samples[-1])])
    headers: list[tuple[int, int]] = []
    nibbles: list[list[int]] = []
    index = 0
    for b in range(n_blocks):
        blk = padded[b * spb : (b + 1) * spb]
        pred = int(blk[0])
        headers.append((pred, index))
        nibs = []
        for v in blk[1:]:
            nib, pred, index = encode_sample(int(v), pred, index)
            nibs.append(nib)
        nibbles.append(nibs)
    wav = build_ima_wav(headers, nibbles, sample_rate, block_align)
    if n != n_blocks * spb:  # rewrite fact with the true sample count
        wav = bytearray(wav)
        fact_at = wav.find(b"fact")
        struct.pack_into("<I", wav, fact_at + 8, n)
        wav = bytes(wav)
    return wav


def decode_ima_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono WAV 0x0011 stream -> (int16 samples, sample_rate).

    Full container parse (RIFF walk, fmt/fact/data chunks, per-block
    state headers) + the integer state machine.  Stereo and other format
    tags raise precisely."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    fact_samples = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated RIFF chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            (fact_samples,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _br, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != WAVE_FORMAT_IMA_ADPCM:
        raise ValueError(f"not IMA-ADPCM (format tag 0x{tag:04x})")
    if channels != 1:
        raise NotImplementedError("stereo IMA-ADPCM (interleaved 4-byte "
                                  "channel groups) not supported — mono only")
    if bits != 4:
        raise ValueError("IMA-ADPCM requires 4 bits per sample")
    spb = (block_align - 4) * 2 + 1
    if len(data) % block_align:
        raise ValueError("data chunk is not a whole number of blocks")
    out: list[int] = []
    for off in range(0, len(data), block_align):
        pred, index, _rsv = struct.unpack_from("<hBB", data, off)
        if index > 88:
            raise ValueError("block step index out of range")
        out.append(pred)
        for byte in data[off + 4 : off + block_align]:
            for nib in (byte & 0x0F, byte >> 4):  # low nibble first
                pred, index = decode_nibble(nib, pred, index)
                out.append(pred)
    if fact_samples is not None:
        if fact_samples > len(out):
            raise ValueError("fact chunk claims more samples than decoded")
        out = out[:fact_samples]
    return np.asarray(out, dtype=np.int64), rate
