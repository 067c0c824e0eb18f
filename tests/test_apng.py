"""APNG codec unit tests — chunk layer, sequence contract, compositing.

The compositing engine is the new state vs plain PNG: these tests pin
each dispose op's canvas effect, OVER's transparent-pixel no-op and its
fractional-alpha formula, the frame-0 PREVIOUS->BACKGROUND degrade the
spec mandates, and the animation-layer validation (sequence numbers,
acTL/fcTL geometry, stream-length cross-checks).  The official query's
DuckDB oracle replays the same algebra in SQL
(catalog/llm_multimodal.py multimodal_decode_apng_frames).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flinkexp_spark.functions.apng import (
    BLEND_OVER,
    BLEND_SOURCE,
    DISPOSE_BACKGROUND,
    DISPOSE_NONE,
    DISPOSE_PREVIOUS,
    ApngError,
    build_apng,
    decode_apng,
)
from flinkexp_spark.functions.png import PngError


def _solid(h: int, w: int, rgb: int, a: int = 255) -> np.ndarray:
    pix = np.zeros((h, w, 4), np.uint8)
    pix[..., :3] = rgb
    pix[..., 3] = a
    return pix


def test_single_frame_roundtrip() -> None:
    f0 = _solid(3, 5, 42)
    canv, meta = decode_apng(build_apng(5, 3, [(0, 0, f0, 0, 0)]))
    assert meta == {"width": 5, "height": 3, "n_frames": 1}
    assert np.array_equal(canv[0], f0)


def test_dispose_none_keeps_backdrop() -> None:
    frames = [
        (0, 0, _solid(4, 4, 10), DISPOSE_NONE, BLEND_SOURCE),
        (1, 1, _solid(2, 2, 200), DISPOSE_NONE, BLEND_SOURCE),
    ]
    canv, _ = decode_apng(build_apng(4, 4, frames))
    assert canv[1, 0, 0, 0] == 10 and canv[1, 1, 1, 0] == 200


def test_dispose_background_clears_region() -> None:
    frames = [
        (0, 0, _solid(4, 4, 10), DISPOSE_NONE, BLEND_SOURCE),
        (1, 1, _solid(2, 2, 200), DISPOSE_BACKGROUND, BLEND_SOURCE),
        (0, 0, _solid(1, 1, 99), DISPOSE_NONE, BLEND_SOURCE),
    ]
    canv, _ = decode_apng(build_apng(4, 4, frames))
    # frame 2: f1's region is transparent black, the rest still shows f0
    assert canv[2, 1, 1].tolist() == [0, 0, 0, 0]
    assert canv[2, 3, 3, 0] == 10
    assert canv[2, 0, 0, 0] == 99


def test_dispose_previous_reverts_region() -> None:
    frames = [
        (0, 0, _solid(4, 4, 10), DISPOSE_NONE, BLEND_SOURCE),
        (1, 1, _solid(2, 2, 200), DISPOSE_PREVIOUS, BLEND_SOURCE),
        (0, 0, _solid(1, 1, 99), DISPOSE_NONE, BLEND_SOURCE),
    ]
    canv, _ = decode_apng(build_apng(4, 4, frames))
    assert canv[1, 1, 1, 0] == 200  # shown while frame 1 is up
    assert canv[2, 1, 1, 0] == 10  # reverted, NOT cleared
    assert canv[2, 1, 1, 3] == 255


def test_frame0_previous_degrades_to_background() -> None:
    # spec: PREVIOUS on the first frame is treated as BACKGROUND — frame 1
    # must composite onto a cleared canvas, not onto frame 0's pixels
    frames = [
        (0, 0, _solid(3, 3, 10), DISPOSE_PREVIOUS, BLEND_SOURCE),
        (0, 0, _solid(1, 1, 99), DISPOSE_NONE, BLEND_SOURCE),
    ]
    canv, _ = decode_apng(build_apng(3, 3, frames))
    assert canv[1, 2, 2].tolist() == [0, 0, 0, 0]
    assert canv[1, 0, 0, 0] == 99


def test_blend_over_transparent_pixels_keep_dst() -> None:
    top = _solid(2, 2, 200)
    top[0, 0, 3] = 0  # transparent: must leave backdrop rgb AND alpha
    frames = [
        (0, 0, _solid(2, 2, 10), DISPOSE_NONE, BLEND_SOURCE),
        (0, 0, top, DISPOSE_NONE, BLEND_OVER),
    ]
    canv, _ = decode_apng(build_apng(2, 2, frames))
    assert canv[1, 0, 0].tolist() == [10, 10, 10, 255]
    assert canv[1, 0, 1].tolist() == [200, 200, 200, 255]


def test_blend_over_fractional_alpha_formula() -> None:
    # src a=128 over opaque dst: out = round((s*a + d*(1-a)))
    top = _solid(1, 1, 200, a=128)
    frames = [
        (0, 0, _solid(1, 1, 100), DISPOSE_NONE, BLEND_SOURCE),
        (0, 0, top, DISPOSE_NONE, BLEND_OVER),
    ]
    canv, _ = decode_apng(build_apng(1, 1, frames))
    sa = 128 / 255.0
    want = round((200 * sa + 100 * (1 - sa)))
    assert canv[1, 0, 0, 0] == want
    assert canv[1, 0, 0, 3] == 255


def test_sequence_numbers_validated() -> None:
    payload = bytearray(
        build_apng(
            2,
            2,
            [
                (0, 0, _solid(2, 2, 10), 0, 0),
                (0, 0, _solid(2, 2, 20), 0, 1),
            ],
        )
    )
    # corrupt the fdAT sequence number (fcTL0=0, fcTL1=1, fdAT=2)
    at = bytes(payload).find(b"fdAT")
    payload[at + 4 : at + 8] = struct.pack(">I", 7)
    # CRC now mismatches too — recompute so only the SEQUENCE check trips
    import zlib

    (length,) = struct.unpack(">I", bytes(payload[at - 4 : at]))
    body = bytes(payload[at : at + 4 + length])
    payload[at + 4 + length : at + 8 + length] = struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )
    with pytest.raises(ApngError, match="sequence"):
        decode_apng(bytes(payload))


def test_geometry_and_frame_count_validated() -> None:
    with pytest.raises(ApngError, match="canvas"):
        build_apng(4, 4, [(0, 0, _solid(4, 4, 1), 0, 0),
                          (3, 3, _solid(2, 2, 1), 0, 0)])
    with pytest.raises(ApngError, match="frame 0"):
        build_apng(4, 4, [(1, 0, _solid(4, 3, 1), 0, 0)])
    good = build_apng(2, 2, [(0, 0, _solid(2, 2, 1), 0, 0)])
    with pytest.raises(PngError):
        decode_apng(good[:-4])


def test_plain_png_is_not_an_animation() -> None:
    from flinkexp_spark.functions.png import encode_png

    plain = encode_png(np.zeros((2, 2, 4), np.uint8), color_type=6)
    with pytest.raises(ApngError, match="acTL"):
        decode_apng(plain)


def test_stats_positions_pin_compositing_order() -> None:
    # the pos_checksum contract: C-order ravel of (F, H, W, 4) equals
    # ((f*H + y)*W + x)*4 + c — a frame swap or channel flip moves mass
    frames = [
        (0, 0, _solid(2, 3, 5), DISPOSE_NONE, BLEND_SOURCE),
        (0, 0, _solid(2, 3, 9), DISPOSE_NONE, BLEND_SOURCE),
    ]
    canv, _ = decode_apng(build_apng(3, 2, frames))
    flat = canv.astype(np.int64).ravel()
    for f in range(2):
        for y in range(2):
            for x in range(3):
                for c in range(4):
                    idx = ((f * 2 + y) * 3 + x) * 4 + c
                    assert flat[idx] == canv[f, y, x, c]
