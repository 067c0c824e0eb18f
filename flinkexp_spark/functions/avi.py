"""Pure-python AVI/MJPEG container — REAL video decode for the X5 path.

Closes the video half of the compressed-media boundary at the honest
level: Motion-JPEG is genuine video-in-the-wild (cameras, webcams,
surveillance, legacy web) whose frames are complete baseline JFIF
streams — so an AVI RIFF demuxer (this module, fully derivable from the
public RIFF/AVI layout) composed with the from-spec JPEG entropy decoder
(functions/jpeg.py) is a REAL end-to-end video decode, not a stub.  The
inter-frame-prediction formats (h264 etc.) remain the documented
boundary (functions/multimodal.py:1203): their normative tables are not
derivable offline, same argument as MP3/Vorbis (functions/flac.py:9).

Layout written and verified here (all public structure, no magic data):

  RIFF <sz> 'AVI '
    LIST 'hdrl'
      'avih' 56-byte main header (frame period, frame count, dims)
      LIST 'strl'
        'strh' 56-byte stream header ('vids'/'MJPG', scale/rate = fps)
        'strf' 40-byte BITMAPINFOHEADER (biCompression = 'MJPG')
    LIST 'movi'
      '00dc' <jpeg bytes>  (word-aligned: odd chunks get a pad byte)
      ...
    'idx1' 16-byte entries: ckid, flags, offset (from 'movi'), length

The demuxer cross-checks everything checkable: header geometry against
the declared stream, frame count against both avih and idx1, every idx1
offset against the actual chunk position, JPEG SOI/EOI magic per frame,
word alignment, and LIST/chunk size arithmetic.
"""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401 — callers operate on decoded frames

AVIF_HASINDEX = 0x10
AVIIF_KEYFRAME = 0x10


class AviError(ValueError):
    """Malformed or unsupported AVI stream."""


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def build_mjpeg_avi(
    frames: list[bytes], width: int, height: int, fps: int
) -> bytes:
    """Assemble complete JFIF streams into a standard MJPG AVI."""
    if not frames:
        raise AviError("no frames")
    for f in frames:
        if f[:2] != b"\xff\xd8" or f[-2:] != b"\xff\xd9":
            raise AviError("frame is not a complete JPEG stream")
    n = len(frames)
    maxb = max(len(f) for f in frames)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxb * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        maxb,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (rate/scale = fps)
            0,  # dwStart
            n,  # dwLength (in frames)
            maxb,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (driver default)
            0,  # dwSampleSize (0: variable-size frames)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    offsets = []  # chunk offset relative to the 'movi' fourcc, per spec
    for f in frames:
        offsets.append(4 + len(movi_payload))
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", bytes(movi_payload))

    idx = bytearray()
    for off, f in zip(offsets, frames):
        idx += b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, off, len(f))
    idx1 = _chunk(b"idx1", bytes(idx))

    return _list(b"AVI ", hdrl + movi + idx1).replace(b"LIST", b"RIFF", 1)


def demux_mjpeg_avi(data: bytes) -> tuple[list[bytes], dict]:
    """Demux an MJPG AVI into per-frame JPEG payloads + header metadata.

    Every cross-checkable invariant is verified: RIFF/AVI magic, header
    geometry, MJPG fourcc in strh AND strf, frame counts (avih vs movi
    vs idx1), idx1 offsets against real chunk positions, per-frame JPEG
    SOI/EOI magic, and word alignment of every chunk.
    """
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("bad RIFF/AVI signature")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if 8 + riff_size != len(data):
        raise AviError("RIFF size does not match stream length")

    avih = strh = strf = None
    frames: list[bytes] = []
    frame_positions: list[int] = []  # offset of each 00dc relative to movi
    idx_entries: list[tuple[int, int]] = []

    def walk(pos: int, end: int, in_movi: bool, movi_base: int) -> None:
        nonlocal avih, strh, strf
        while pos < end:
            if pos + 8 > end:
                raise AviError("truncated chunk header")
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise AviError(f"chunk {fourcc!r} overruns its parent")
            if fourcc == b"LIST":
                ltype = data[body_start : body_start + 4]
                walk(
                    body_start + 4,
                    body_end,
                    ltype == b"movi",
                    body_start if ltype == b"movi" else movi_base,
                )
            elif fourcc == b"avih":
                avih = struct.unpack("<14I", data[body_start:body_end])
            elif fourcc == b"strh":
                if data[body_start : body_start + 4] != b"vids":
                    raise AviError("first stream is not video")
                if data[body_start + 4 : body_start + 8] != b"MJPG":
                    raise AviError("stream handler is not MJPG")
                strh = struct.unpack(
                    "<IHHIIIIIIII4H", data[body_start + 8 : body_end]
                )
            elif fourcc == b"strf":
                strf = struct.unpack("<IiiHH4sIiiII", data[body_start:body_end])
                if strf[5] != b"MJPG":
                    raise AviError("BITMAPINFOHEADER compression is not MJPG")
            elif fourcc == b"00dc":
                if not in_movi:
                    raise AviError("frame chunk outside the movi list")
                frame = data[body_start:body_end]
                if frame[:2] != b"\xff\xd8" or frame[-2:] != b"\xff\xd9":
                    raise AviError("00dc payload is not a JPEG stream")
                frames.append(frame)
                frame_positions.append(pos - movi_base)
            elif fourcc == b"idx1":
                if size % 16:
                    raise AviError("idx1 size not a multiple of 16")
                for i in range(body_start, body_end, 16):
                    ckid = data[i : i + 4]
                    _flags, off, ln = struct.unpack(
                        "<III", data[i + 4 : i + 16]
                    )
                    if ckid != b"00dc":
                        raise AviError(f"unexpected idx1 ckid {ckid!r}")
                    idx_entries.append((off, ln))
            pos = body_end + (size % 2)  # word alignment

    walk(12, len(data), False, 0)

    if avih is None or strh is None or strf is None:
        raise AviError("missing avih/strh/strf header")
    if not frames:
        raise AviError("no frames in movi list")
    if avih[4] != len(frames):
        raise AviError(
            f"avih declares {avih[4]} frames, movi carries {len(frames)}"
        )
    if len(idx_entries) != len(frames):
        raise AviError("idx1 entry count does not match frame count")
    for (off, ln), pos, frame in zip(idx_entries, frame_positions, frames):
        if off != pos or ln != len(frame):
            raise AviError("idx1 offset/length mismatch")
    scale, rate = strh[4], strh[5]
    if scale == 0 or rate % scale:
        raise AviError("non-integer frame rate")
    meta = {
        "width": avih[8],
        "height": avih[9],
        "n_frames": len(frames),
        "fps": rate // scale,
    }
    if strh[7] != len(frames):
        raise AviError("strh dwLength does not match frame count")
    if (strf[1], strf[2]) != (meta["width"], meta["height"]):
        raise AviError("strf geometry disagrees with avih")
    return frames, meta
