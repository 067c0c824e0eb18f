"""Randomized round-trip sweeps for the container walkers.

Each test builds a few hundred SEEDED random payloads spanning the spec
corners the fixtures never hit (multi-segment Ogg lacing, every MP3
bitrate/samplerate table entry, JPEG 16-bit and multi-table DQT segments,
progressive SOF2, arbitrary APPn) with its own independent encoder, runs
them through the engine decoder in ONE Spark job, and compares field by
field against the generation parameters.  A parser bug that only bites an
unusual-but-legal container shape fails here, not in production.
"""

from __future__ import annotations

import random
import struct

import pandas as pd

from flinkexp_spark.functions import multimodal as M

N_CASES = 250


def _run(spark, decode_fn, payloads):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(range(len(payloads))), "payload": payloads}
        ),
        schema="doc_id long, payload binary",
    )
    return {r.doc_id: r for r in decode_fn(df).collect()}


def test_ogg_walker_roundtrips_random_streams(spark):
    rng = random.Random(0xA11CE)
    payloads, expected = [], []
    for _ in range(N_CASES):
        n_pages = rng.randint(1, 12)
        serial = rng.randint(0, 2**31 - 1)
        out = bytearray()
        granule = 0
        body_bytes = body_sum = 0
        for i in range(n_pages):
            # spec corner: bodies above 255 need multi-segment lacing
            blen = rng.choice([0, 1, rng.randint(2, 200), rng.randint(256, 700)])
            body = bytes(rng.randrange(256) for _ in range(blen))
            granule += blen
            body_bytes += blen
            body_sum += sum(body)
            lacing = []
            rem = blen
            while rem >= 255:
                lacing.append(255)
                rem -= 255
            lacing.append(rem)  # terminal segment, may be 0
            htype = (0x02 if i == 0 else 0) | (0x04 if i == n_pages - 1 else 0)
            out += b"OggS" + struct.pack(
                "<BBqIIIB", 0, htype, granule, serial, i, 0, len(lacing)
            )
            out += bytes(lacing) + body
        payloads.append(bytes(out))
        expected.append((n_pages, body_bytes, body_sum, granule, serial))

    rows = _run(spark, M.decode_ogg_meta, payloads)
    for i, (n_pages, body_bytes, body_sum, granule, serial) in enumerate(expected):
        r = rows[i]
        assert (
            r.n_pages, r.n_body_bytes, r.body_sum, r.last_granule, r.serial
        ) == (n_pages, body_bytes, body_sum, granule, serial), f"case {i}"


def test_mp3_walker_roundtrips_every_table_entry(spark):
    table = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    rates = [44100, 48000, 32000]
    rng = random.Random(0xBEEF)
    payloads, expected = [], []
    # exhaustive (bitrate, samplerate) grid plus random frame counts/padding
    for br_idx in range(1, 15):
        for sr_idx in range(3):
            for _ in range(4):
                n_frames = rng.randint(1, 9)
                kbps, rate = table[br_idx], rates[sr_idx]
                out = bytearray()
                for i in range(n_frames):
                    padding = rng.randint(0, 1)
                    b3 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
                    frame_len = 144 * kbps * 1000 // rate + padding
                    out += bytes((0xFF, 0xFB, b3, rng.randrange(256)))
                    out += bytes(rng.randrange(256) for _ in range(frame_len - 4))
                payloads.append(bytes(out))
                expected.append(
                    (n_frames, kbps, rate, n_frames * 1152 * 1000 // rate, len(out))
                )

    rows = _run(spark, M.decode_mp3_meta, payloads)
    for i, (n_frames, kbps, rate, dur, nbytes) in enumerate(expected):
        r = rows[i]
        assert (
            r.n_frames, r.bitrate_kbps, r.sample_rate, r.duration_ms, r.n_bytes
        ) == (n_frames, kbps, rate, dur, nbytes), f"case {i}"


def test_jpeg_walker_roundtrips_random_headers(spark):
    rng = random.Random(0xD00D)
    payloads, expected = [], []
    for _ in range(N_CASES):
        w, h = rng.randint(1, 65535), rng.randint(1, 65535)
        n_comp = rng.choice([1, 3])
        sof = rng.choice([0xC0, 0xC1, 0xC2])  # baseline/extended/progressive
        out = bytearray(b"\xff\xd8")
        # random APPn noise segments the walker must skip by length;
        # legal-but-unusual inter-segment junk too: 0xFF fill bytes and
        # standalone TEM/RSTn markers (no length word follows either)
        for _ in range(rng.randint(0, 3)):
            if rng.random() < 0.3:
                out += b"\xff" * rng.randint(1, 4)  # fill bytes
            if rng.random() < 0.3:
                out += bytes((0xFF, rng.choice([0x01, *range(0xD0, 0xD8)])))
            app = 0xE0 + rng.randint(0, 15)
            blob = bytes(rng.randrange(256) for _ in range(rng.randint(0, 40)))
            out += bytes((0xFF, app)) + struct.pack(">H", 2 + len(blob)) + blob
        # 1-2 DQT segments; each holds 1-2 tables, 8-bit or 16-bit
        dqt_sum = 0
        for _ in range(rng.randint(1, 2)):
            body = bytearray()
            for t in range(rng.randint(1, 2)):
                pq = rng.randint(0, 1)
                vals = [rng.randint(1, 255 if pq == 0 else 65535) for _ in range(64)]
                dqt_sum += sum(vals)
                body.append((pq << 4) | t)
                body += (
                    struct.pack(">64H", *vals) if pq else bytes(vals)
                )
            out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + bytes(body)
        out += bytes((0xFF, sof)) + struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w, n_comp)
        for cid in range(n_comp):
            out += bytes((cid + 1, 0x11, 0))
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n_comp, n_comp)
        for cid in range(n_comp):
            out += bytes((cid + 1, 0x00))
        out += bytes((0, 63, 0))
        out += b"\xff\xd9"
        payloads.append(bytes(out))
        expected.append((w, h, n_comp, dqt_sum))

    rows = _run(spark, M.decode_jpeg_meta, payloads)
    for i, (w, h, n_comp, dqt_sum) in enumerate(expected):
        r = rows[i]
        assert (r.width, r.height, r.n_components, r.precision, r.dqt_sum) == (
            w, h, n_comp, 8, dqt_sum
        ), f"case {i}"


def test_jpeg_walker_truncated_fill_run_raises_valueerror(spark):
    """A stream ending inside a 0xFF fill run must exit the walk loop and
    raise the walker's contractual ValueError (no SOF), never IndexError."""
    import pytest

    for payload in (b"\xff\xd8\xff\xff", b"\xff\xd8\xff", b"\xff\xd8\xff\xff\xff"):
        with pytest.raises(Exception) as ei:
            _run(spark, M.decode_jpeg_meta, [payload])
        # pin the SPECIFIC exit path: the walk must end cleanly and reach
        # the 'no SOF' contract error, not IndexError or another ValueError
        assert "no SOF" in str(ei.value), str(ei.value)[:200]
