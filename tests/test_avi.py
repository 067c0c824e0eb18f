"""AVI/MJPEG container tests — demux round-trips and cross-check guards."""

import struct

import numpy as np
import pytest

from flinkexp_spark.functions.avi import (
    AviError,
    build_mjpeg_avi,
    demux_mjpeg_avi,
)
from flinkexp_spark.functions.jpeg import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def _jpeg_frame(seed: int, h: int = 16, w: int = 24) -> bytes:
    rng = np.random.default_rng(seed)
    q = np.full(64, 16, dtype=np.int64)
    q[0] = 8
    gray = rng.integers(48, 208, size=(h, w), dtype=np.uint8)
    return encode_baseline_jpeg(np.stack([gray] * 3, axis=-1), [q, q])


def _avi(n=3, h=16, w=24, fps=15):
    return build_mjpeg_avi([_jpeg_frame(i, h, w) for i in range(n)], w, h, fps)


def test_roundtrip_payloads_and_meta():
    frames_in = [_jpeg_frame(i) for i in range(4)]
    blob = build_mjpeg_avi(frames_in, 24, 16, 10)
    frames_out, meta = demux_mjpeg_avi(blob)
    assert frames_out == frames_in  # byte-identical payload round-trip
    assert meta == {"width": 24, "height": 16, "n_frames": 4, "fps": 10}


def test_frames_decode_like_standalone_jpegs():
    blob = _avi(n=2)
    frames, _ = demux_mjpeg_avi(blob)
    for i, fr in enumerate(frames):
        np.testing.assert_array_equal(
            decode_baseline_jpeg(fr), decode_baseline_jpeg(_jpeg_frame(i))
        )


def test_odd_length_frames_word_aligned():
    # force an odd-length JPEG by tweaking until one appears
    for seed in range(40):
        f = _jpeg_frame(seed, 8, 8)
        if len(f) % 2:
            blob = build_mjpeg_avi([f, f], 8, 8, 10)
            out, meta = demux_mjpeg_avi(blob)
            assert out == [f, f]
            return
    pytest.skip("no odd-length frame produced")


def test_bad_magic_raises():
    blob = bytearray(_avi())
    blob[8:12] = b"WAVE"
    with pytest.raises(AviError, match="signature"):
        demux_mjpeg_avi(bytes(blob))


def test_riff_size_mismatch_raises():
    with pytest.raises(AviError, match="RIFF size"):
        demux_mjpeg_avi(_avi() + b"\x00\x00")


def test_idx1_offset_corruption_raises():
    blob = bytearray(_avi(n=2))
    i = blob.rindex(b"idx1")
    # entry 0 offset field: idx1(4) + size(4) + ckid(4) + flags(4)
    pos = i + 16
    (off,) = struct.unpack("<I", blob[pos : pos + 4])
    blob[pos : pos + 4] = struct.pack("<I", off + 2)
    with pytest.raises(AviError, match="idx1 offset"):
        demux_mjpeg_avi(bytes(blob))


def test_frame_count_mismatch_raises():
    blob = bytearray(_avi(n=3))
    i = blob.index(b"avih")
    # dwTotalFrames is the 5th dword of avih payload
    pos = i + 8 + 16
    blob[pos : pos + 4] = struct.pack("<I", 99)
    with pytest.raises(AviError, match="declares 99 frames"):
        demux_mjpeg_avi(bytes(blob))


def test_non_jpeg_frame_raises():
    f = _jpeg_frame(1)
    with pytest.raises(AviError, match="not a complete JPEG"):
        build_mjpeg_avi([f[:-2]], 24, 16, 10)
    # and on the demux side: corrupt the SOI of frame 0 in a valid file
    blob = bytearray(build_mjpeg_avi([f], 24, 16, 10))
    i = blob.index(b"\xff\xd8", 100)  # first SOI inside movi
    blob[i] = 0x00
    with pytest.raises(AviError):
        demux_mjpeg_avi(bytes(blob))


def test_wrong_handler_raises():
    blob = bytearray(_avi())
    i = blob.index(b"MJPG")  # strh fccHandler
    blob[i : i + 4] = b"H264"
    with pytest.raises(AviError, match="not MJPG"):
        demux_mjpeg_avi(bytes(blob))
