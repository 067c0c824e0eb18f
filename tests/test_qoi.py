"""QOI codec unit tests — spec grammar, inverse property, error paths.

The chunk grammar is pinned four ways: (1) hand-decoded byte-level
landmarks straight from the one-page spec (tag values, bias encodings,
the 62-run cap with 63/64 reserved for the RGB/RGBA tags), (2) the exact
inverse property decode(encode(px)) == px over adversarial images (all
six ops, wrap-around deltas, hash collisions, alpha changes), (3) the
fixture chain used by the official query (all six ops must be LIVE in
the first 100 docs — the oracle-checked corpus), (4) strict-decoder
error paths (bad magic, truncation, run overrun, trailing chunk bytes).
The official query's DuckDB oracle recomputes the pixels independently
(catalog/llm_multimodal.py multimodal_decode_qoi_pixels).
"""

from __future__ import annotations

import numpy as np
import pytest

from flinkexp_spark.functions.multimodal import qoi_fixture_pixels
from flinkexp_spark.functions.qoi import (
    QOI_END,
    QOI_MAGIC,
    QoiError,
    decode_qoi,
    encode_qoi,
    op_histogram,
)


def _img(rows, channels=4):
    return np.array(rows, dtype=np.uint8).reshape(1, -1, channels)


def test_header_and_end_marker() -> None:
    data = encode_qoi(_img([[1, 2, 3, 255]]), channels=4)
    assert data[:4] == QOI_MAGIC
    # BE u32 dims: w=1, h=1; channels=4, colorspace=0
    assert data[4:14] == bytes([0, 0, 0, 1, 0, 0, 0, 1, 4, 0])
    assert data[-8:] == QOI_END


def test_spec_landmark_bytes() -> None:
    # First pixel (10, 20, 30) from the implicit (0,0,0,255) start: no
    # index hit (slots zeroed), deltas too big for DIFF/LUMA -> QOI_OP_RGB
    # = 0xFE tag + 3 bytes.
    data = encode_qoi(_img([[10, 20, 30]], 3), channels=3)
    assert data[14:18] == bytes([0xFE, 10, 20, 30])
    # A +1/+1/+1 step is QOI_OP_DIFF: 0b01 (dr+2)(dg+2)(db+2) = 0x7F.
    data = encode_qoi(_img([[10, 20, 30], [11, 21, 31]], 3), channels=3)
    assert data[18] == 0x40 | (3 << 4) | (3 << 2) | 3
    # A green +8, red/blue tracking step is QOI_OP_LUMA:
    # 0b10 | (dg+32), then (dr-dg+8)<<4 | (db-dg+8).
    data = encode_qoi(_img([[10, 20, 30], [18, 28, 38]], 3), channels=3)
    assert data[18] == 0x80 | (8 + 32)
    assert data[19] == (8 << 4) | 8
    # A repeat is QOI_OP_RUN with bias -1: run of 1 = 0xC0.
    data = encode_qoi(_img([[10, 20, 30], [10, 20, 30]], 3), channels=3)
    assert data[18] == 0xC0


def test_run_caps_at_62() -> None:
    # 100 identical pixels after the first (which is QOI_OP_RGB — the
    # green delta 100 overflows LUMA): runs of 62 + 38 (0xC0|61, 0xC0|37)
    # — lengths 63/64 are reserved (their tag bytes are RGB/RGBA).
    px = np.tile(np.array([200, 100, 50], np.uint8), (1, 101, 1))
    data = encode_qoi(px, channels=3)
    assert data[14] == 0xFE
    assert data[18] == 0xC0 | 61
    assert data[19] == 0xC0 | 37
    w, h, _, out = decode_qoi(data)
    assert (w, h) == (101, 1)
    assert np.array_equal(out[:, :3], np.tile([200, 100, 50], (101, 1)))


def test_index_hit_and_hash() -> None:
    # A returns to a previously-seen color via the 64-slot index:
    # hash(10,20,30,255) = (30+100+210+2805) % 64.
    a, b = [10, 20, 30], [200, 100, 50]
    px = np.array([a, b, a], np.uint8).reshape(1, 3, 3)
    data = encode_qoi(px, channels=3)
    h = (10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64
    assert data[-9] == h  # last chunk before the end marker: QOI_OP_INDEX
    _, _, _, out = decode_qoi(data)
    assert np.array_equal(out[:, :3], px.reshape(3, 3))


def test_alpha_change_forces_rgba() -> None:
    px = np.array([[10, 20, 30, 255], [10, 20, 30, 128]], np.uint8)
    data = encode_qoi(px.reshape(1, 2, 4), channels=4)
    assert 0xFF in data[14:-8]
    _, _, _, out = decode_qoi(data)
    assert np.array_equal(out, px)


def test_wraparound_deltas() -> None:
    # 255 -> 0 is a wrapped +1 (DIFF-expressible); 0 -> 255 a wrapped -1.
    px = np.array([[255, 255, 255], [0, 0, 0], [255, 255, 255]], np.uint8)
    data = encode_qoi(px.reshape(1, 3, 3), channels=3)
    _, _, _, out = decode_qoi(data)
    assert np.array_equal(out[:, :3], px)


def test_roundtrip_random_images() -> None:
    rng = np.random.default_rng(42)
    for trial in range(8):
        h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        channels = 3 if trial % 2 else 4
        # mix smooth regions (DIFF/LUMA/RUN) with jumps (RGB/INDEX)
        base = rng.integers(0, 256, (h, w, channels))
        smooth = np.cumsum(rng.integers(-2, 2, (h, w, channels)), axis=1)
        px = np.where(
            rng.random((h, w, 1)) < 0.5, base, (100 + smooth) % 256
        ).astype(np.uint8)
        data = encode_qoi(px, channels=channels)
        w2, h2, c2, out = decode_qoi(data)
        assert (w2, h2, c2) == (w, h, channels)
        assert np.array_equal(
            out[:, :channels].reshape(h, w, channels), px
        ), f"trial {trial}"


def test_fixture_chain_lights_all_six_ops() -> None:
    """The oracle-checked corpus (doc_id < 100 shapes) must exercise every
    chunk op — the point of the palette-jump fixture design."""
    totals = {"rgb": 0, "rgba": 0, "index": 0, "diff": 0, "luma": 0, "run": 0}
    for doc in range(16):
        text = f"doc {doc} " + "lorem ipsum dolor sit amet " * (doc % 7)
        w, h, channels, px = qoi_fixture_pixels(doc, text)
        data = encode_qoi(px, channels=channels)
        w2, h2, c2, out = decode_qoi(data)
        assert (w2, h2, c2) == (w, h, channels)
        assert np.array_equal(
            out[:, :channels].reshape(h, w, channels), px
        )
        for k, v in op_histogram(data).items():
            totals[k] += v
    assert all(totals[k] > 0 for k in totals), totals


def test_decoder_error_paths() -> None:
    good = encode_qoi(_img([[1, 2, 3, 255], [9, 9, 9, 255]]), channels=4)
    with pytest.raises(QoiError, match="magic"):
        decode_qoi(b"notq" + good[4:])
    with pytest.raises(QoiError, match="short"):
        decode_qoi(good[:10])
    with pytest.raises(QoiError, match="end marker"):
        decode_qoi(good[:-1] + b"\x02")
    with pytest.raises(QoiError, match="underrun|short"):
        # drop the last chunk byte: fewer pixels than w*h decode
        decode_qoi(good[:14] + good[14:-12] + QOI_END)
    with pytest.raises(QoiError, match="trailing"):
        # extra chunk byte after w*h pixels decoded
        decode_qoi(good[:-8] + b"\xc0" + QOI_END)
    # run overrunning the pixel count: 1x1 image with a run-2 chunk
    bad = (
        QOI_MAGIC
        + bytes([0, 0, 0, 1, 0, 0, 0, 1, 3, 0])
        + bytes([0xFE, 1, 2, 3, 0xC0 | 1])
        + QOI_END
    )
    with pytest.raises(QoiError, match="overrun|trailing"):
        decode_qoi(bad)


def test_decoder_truncated_operand_reads_raise_qoi_error() -> None:
    """ADVICE r11: an RGB/RGBA/LUMA tag whose operand bytes are cut off
    mid-op must raise QoiError (the documented malformed-stream contract),
    not a bare IndexError from indexing past the chunk buffer."""
    hdr = QOI_MAGIC + bytes([0, 0, 0, 2, 0, 0, 0, 1, 4, 0])  # 2x1 RGBA
    # RGB tag (0xFE) with only 1 of 3 operand bytes before the end marker
    with pytest.raises(QoiError, match="truncated RGB"):
        decode_qoi(hdr + bytes([0xFE, 1]) + QOI_END)
    # RGBA tag (0xFF) with 3 of 4 operand bytes
    with pytest.raises(QoiError, match="truncated RGBA"):
        decode_qoi(hdr + bytes([0xFF, 1, 2, 3]) + QOI_END)
    # LUMA tag (0b10xxxxxx) with its second byte missing
    with pytest.raises(QoiError, match="truncated LUMA"):
        decode_qoi(hdr + bytes([0x80]) + QOI_END)


def test_encoder_input_validation() -> None:
    with pytest.raises(QoiError, match="pixels"):
        encode_qoi(np.zeros((4, 4), np.uint8))
    with pytest.raises(QoiError, match="channels"):
        encode_qoi(np.zeros((2, 2, 3), np.uint8), channels=2)
