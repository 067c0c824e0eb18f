"""From-spec LZMA2 decoder (functions/lzma2.py) vs stdlib lzma.

Stdlib ``lzma`` with FORMAT_RAW + FILTER_LZMA2 emits exactly the chunk
sequence :func:`lzma2_decode_chunks` walks (liblzma appends the 0x00 end
marker at flush), giving a byte-exact oracle at the layer BELOW the .xz
container — presets, custom lc/lp/pb, multi-chunk dictionaries, and the
consumed-bytes accounting (``pos`` must land exactly on the end marker,
which pins the spec's post-op normalization order).  The container-layer
pins against the real ``xz`` binary live in tests/test_xz.py.
"""

from __future__ import annotations

import lzma
import random

import pytest

from flinkexp_spark.functions.lzma2 import (
    Lzma2Error,
    lzma2_decode_chunks,
    parse_props,
)


def _enc(data: bytes, **filt) -> bytes:
    filt.setdefault("id", lzma.FILTER_LZMA2)
    return lzma.compress(data, format=lzma.FORMAT_RAW, filters=[filt])


def _corpora() -> dict[str, bytes]:
    rng = random.Random(20260816)
    return {
        "empty": b"",
        "one": b"Q",
        "ascii": b"the quick brown fox jumps over the lazy dog\n" * 100,
        "runs": b"aaaaaaaabbbbbbbbcccccccc" * 4000,
        "random": rng.randbytes(50_000),
        "mixed": b"".join(
            rng.choice([b"tok%d " % i for i in range(50)]) * rng.randrange(1, 6)
            + rng.randbytes(rng.randrange(0, 8))
            for i in range(20_000)
        ),
    }


@pytest.mark.parametrize("preset", [0, 1, 6, 9, 9 | lzma.PRESET_EXTREME])
def test_decodes_stdlib_all_presets(preset: int) -> None:
    for name, data in _corpora().items():
        raw = _enc(data, preset=preset)
        out, pos = lzma2_decode_chunks(raw, 0, None)
        assert out == data, f"{name} preset={preset}"
        # exact consumption: pos lands right after the 0x00 end marker
        assert pos == len(raw), f"{name} preset={preset}: {pos}/{len(raw)}"


@pytest.mark.parametrize(
    ("lc", "lp", "pb"),
    [(0, 0, 0), (4, 0, 2), (0, 4, 0), (2, 2, 2), (3, 0, 2), (1, 3, 4)],
)
def test_decodes_custom_lclppb(lc: int, lp: int, pb: int) -> None:
    data = _corpora()["mixed"][:300_000]
    raw = _enc(data, dict_size=1 << 20, lc=lc, lp=lp, pb=pb)
    out, pos = lzma2_decode_chunks(raw, 0, None)
    assert out == data and pos == len(raw)


def test_multichunk_shared_dictionary() -> None:
    """> 2 MiB forces several compressed chunks in sequence; matches in
    later chunks reach back into earlier chunks' output."""
    rng = random.Random(42)
    words = [b"alpha", b"beta", b"gamma", b"delta", b"epsilon123"]
    data = b"".join(
        rng.choice(words) * rng.randrange(1, 30) + rng.randbytes(rng.randrange(0, 20))
        for _ in range(120_000)
    )
    assert len(data) > 4 * 1024 * 1024
    raw = _enc(data, preset=6)
    out, pos = lzma2_decode_chunks(raw, 0, None)
    assert out == data and pos == len(raw)


def test_props_byte_contract() -> None:
    assert parse_props(0x5D) == (3, 0, 2)  # the default 0x5D = lc3 lp0 pb2
    assert parse_props(0) == (0, 0, 0)
    with pytest.raises(Lzma2Error, match="invalid LZMA props"):
        parse_props(225)
    # lc+lp > 4 is legal LZMA but forbidden by LZMA2
    with pytest.raises(Lzma2Error, match="lc\\+lp"):
        parse_props(4 + 9 * 1)  # lc=4, lp=1


def test_error_paths() -> None:
    data = b"spark graft lzma2 error paths " * 200
    raw = bytearray(_enc(data, preset=6))
    # truncation inside the compressed payload
    with pytest.raises(Lzma2Error):
        lzma2_decode_chunks(bytes(raw[: len(raw) // 2]), 0, None)
    # missing end marker
    with pytest.raises(Lzma2Error, match="end marker"):
        lzma2_decode_chunks(bytes(raw[:-1]), 0, None)
    # first chunk must reset the dictionary: rewrite control byte's
    # reset bits from 3 (props+state+dict) to 2 (props+state only)
    assert raw[0] >= 0x80 and (raw[0] >> 5) & 0x3 == 3
    bad = raw[:]
    bad[0] = (bad[0] & 0x9F) | (2 << 5)
    with pytest.raises(Lzma2Error, match="reset the dictionary"):
        lzma2_decode_chunks(bytes(bad), 0, None)
    # corrupt a payload byte: the declared sizes stop matching what the
    # range decoder actually consumes/produces (any Lzma2Error is fine —
    # the contract is LOUD failure, never silent wrong bytes)
    bad = raw[:]
    bad[len(bad) // 2] ^= 0x55
    with pytest.raises(Lzma2Error):
        lzma2_decode_chunks(bytes(bad), 0, None)


def test_range_coder_init_contract() -> None:
    data = b"x" * 1000
    raw = bytearray(_enc(data, preset=6))
    # locate the range-coder init byte: ctrl(1) + unpacked(2) + comp(2)
    # + props(1) for a reset-3 first chunk -> offset 6 must be 0
    assert raw[6] == 0
    raw[6] = 1
    with pytest.raises(Lzma2Error, match="must be 0"):
        lzma2_decode_chunks(bytes(raw), 0, None)
