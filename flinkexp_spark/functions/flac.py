"""Pure-python FLAC codec — REAL compressed-audio decode for the X5 path.

Closes the compressed-audio stub (functions/multimodal.py decode_audio) the
same way round 7 closed images with the from-spec JPEG codec
(functions/jpeg.py): a complete encoder + decoder written from the public
format specification, fixtures synthesized by OUR encoder, decode verified
by exact-integer oracles and round-trip property tests.

WHY FLAC AND NOT MP3/VORBIS (the formats the r07 verdict named): ISO/IEC
11172-3 Layer III needs the spec's literal constant tables to be
bit-compliant — the 512-entry Table B.3 synthesis window and 34 Huffman
code tables are normative DATA, not derivable structure — and Vorbis
likewise hard-codes a floor inverse-dB table of spec literals.  Those
literals are not reproducible offline from first principles; shipping a
decoder with invented tables would emit files that CLAIM to be MP3/Vorbis
but aren't, which is worse than an honest stub.  FLAC has no such tables:
every constant it needs is derivable —

* CRC-8 poly x^8+x^2+x+1 (0x07) over the frame header, CRC-16 poly
  x^16+x^15+x^2+1 (0x8005) over the whole frame, both init 0, MSB-first;
* fixed predictors = binomial-coefficient differencing (orders 0-4);
* Rice/Golomb residual coding with zigzag mapping;
* LPC with IN-STREAM quantized coefficients (the encoder below derives
  them with Levinson-Durbin; the decoder just reads them);
* the UTF-8-style frame-number coding.

And FLAC is LOSSLESS, so the decode oracle is exact-integer end-to-end —
no epsilon anywhere.  Reference parity: the reference repo's scope is the
query engine (StreamSocket.scala:15-16 is its only code); the multimodal
column brief is the driving requirement here.

Scope handled: 16-bit PCM, 1-2 channels, all four channel assignments
(independent, left/side, right/side, mid/side), CONSTANT / VERBATIM /
FIXED(0-4) / LPC subframes, 4- and 5-bit Rice partitions with escape
codes, wasted-bits-per-sample, multi-frame streams with CRC-8/CRC-16
verification and the STREAMINFO MD5 check over the decoded PCM.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"
SYNC_CODE = 0b11111111111110

# ---------------------------------------------------------------------------
# CRCs (bitwise from the polynomial — no table literals needed)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for byte in range(256):
        reg = byte << (width - 8)
        for _ in range(8):
            reg = ((reg << 1) ^ poly) if reg & top else (reg << 1)
        table.append(reg & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = _CRC8_TABLE[reg ^ b]
    return reg


def crc16(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = ((reg << 8) & 0xFFFF) ^ _CRC16_TABLE[(reg >> 8) ^ b]
    return reg


# ---------------------------------------------------------------------------
# Bit I/O (MSB-first; FLAC has no byte stuffing)
# ---------------------------------------------------------------------------


class BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, length: int) -> None:
        self.write(value & ((1 << length) - 1), length)

    def write_unary(self, q: int) -> None:
        """q zero bits terminated by a one bit."""
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)


class BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position
        self.acc = 0
        self.nbits = 0

    def read(self, length: int) -> int:
        while self.nbits < length:
            if self.pos >= len(self.data):
                raise ValueError("flac: truncated stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= length
        out = (self.acc >> self.nbits) & ((1 << length) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def read_signed(self, length: int) -> int:
        v = self.read(length)
        if v >= 1 << (length - 1):
            v -= 1 << length
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("flac: runaway unary code")
        return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


# ---------------------------------------------------------------------------
# UTF-8-style coded number (frame header); standard UTF-8 extended to 36 bits
# ---------------------------------------------------------------------------


def encode_utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    # lengths: 2 bytes -> 11 payload bits, 3 -> 16, 4 -> 21, 5 -> 26,
    # 6 -> 31, 7 -> 36
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << bits):
            cont = []
            for _ in range(nbytes - 1):
                cont.append(0x80 | (n & 0x3F))
                n >>= 6
            if nbytes == 7:
                lead = 0xFE
            else:
                lead = (0xFF << (8 - nbytes)) & 0xFF | n
            out = [lead] + cont[::-1]
            return bytes(out)
    raise ValueError("frame number too large")


def decode_utf8_number(reader: BitReader) -> int:
    b0 = reader.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for i in range(7):
        if not (b0 << i) & 0x80:
            break
        nbytes += 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad utf8-coded number")
    n = b0 & (0x7F >> nbytes) if nbytes < 7 else 0
    for _ in range(nbytes - 1):
        b = reader.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad utf8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# Residual coding (Rice with 4/5-bit parameters + escape)
# ---------------------------------------------------------------------------


def _zigzag(res: np.ndarray) -> np.ndarray:
    r = res.astype(np.int64)
    return np.where(r >= 0, r << 1, ((-r) << 1) - 1)


def _best_rice_param(u: np.ndarray, max_param: int) -> tuple[int, int]:
    """Exact-cost scan over k (tiny arrays; determinism beats cleverness)."""
    best_k, best_cost = 0, None
    for k in range(max_param):
        cost = int(np.sum(u >> k)) + len(u) * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k, best_cost


def _write_residual(
    w: BitWriter, res: np.ndarray, blocksize: int, order: int, pmax: int = 2
) -> None:
    """Rice-partitioned residual.  Partition order: the largest p <= pmax
    with blocksize divisible by 2^p and first partition non-empty."""
    p = pmax
    while p > 0 and (blocksize % (1 << p) or (blocksize >> p) <= order):
        p -= 1
    method = 0  # 4-bit params
    w.write(method, 2)
    w.write(p, 4)
    u = _zigzag(res)
    start = 0
    for part in range(1 << p):
        n = (blocksize >> p) - (order if part == 0 else 0)
        pu = u[start : start + n]
        start += n
        k, rice_cost = _best_rice_param(pu, 15)
        raw_bits = int(pu.max()).bit_length() + 1 if len(pu) else 1
        if rice_cost is not None and rice_cost <= 5 + raw_bits * len(pu):
            w.write(k, 4)
            for v in pu.tolist():
                w.write_unary(v >> k)
                w.write(v & ((1 << k) - 1), k)
        else:  # escape: raw fixed-width signed residuals
            w.write(0b1111, 4)
            w.write(raw_bits, 5)
            res_part = res[
                start - n : start
            ]  # original signed values for this partition
            for v in res_part.tolist():
                w.write_signed(int(v), raw_bits)


def _read_residual(
    r: BitReader, blocksize: int, order: int
) -> np.ndarray:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError("flac: reserved residual method")
    pbits, escape = (4, 0b1111) if method == 0 else (5, 0b11111)
    p = r.read(4)
    if blocksize % (1 << p):
        raise ValueError("flac: partition order does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    pos = 0
    for part in range(1 << p):
        n = (blocksize >> p) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("flac: negative partition size")
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            for i in range(n):
                out[pos + i] = r.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = r.read_unary()
                u = (q << k) | (r.read(k) if k else 0)
                out[pos + i] = (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)
        pos += n
    return out


# ---------------------------------------------------------------------------
# Predictors
# ---------------------------------------------------------------------------

# Fixed predictor coefficients = alternating binomials (pascal row o).
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(warm: list[int], res: np.ndarray, order: int) -> np.ndarray:
    x = np.empty(len(res) + order, dtype=np.int64)
    x[:order] = warm
    coef = _FIXED_COEF[order]
    for i in range(order, len(x)):
        pred = 0
        for j, c in enumerate(coef):
            pred += c * x[i - 1 - j]
        x[i] = res[i - order] + pred
    return x


def _lpc_residual(
    x: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    o = len(coefs)
    xl = x.astype(np.int64)
    res = np.empty(len(x) - o, dtype=np.int64)
    for i in range(o, len(x)):
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * xl[i - 1 - j]
        res[i - o] = xl[i] - (pred >> shift)
    return res


def _lpc_restore(
    warm: list[int], res: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    o = len(coefs)
    x = np.empty(len(res) + o, dtype=np.int64)
    x[:o] = warm
    for i in range(o, len(x)):
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * x[i - 1 - j]
        x[i] = res[i - o] + (pred >> shift)
    return x


def _levinson_lpc(x: np.ndarray, order: int) -> list[float] | None:
    """Levinson-Durbin on the autocorrelation; returns float predictor
    coefficients (a[1..order] with x[i] ~= sum a[j] x[i-j])."""
    xf = x.astype(np.float64)
    n = len(xf)
    if n <= order:
        return None
    r = np.array(
        [np.dot(xf[: n - k], xf[k:]) for k in range(order + 1)]
    )
    if r[0] == 0:
        return None
    err = r[0]
    a = np.zeros(order)
    for i in range(order):
        acc = r[i + 1] - np.dot(a[:i], r[1 : i + 1][::-1])
        if err == 0:
            return None
        k = acc / err
        a[:i] = a[:i] - k * a[:i][::-1]
        a[i] = k
        err *= 1 - k * k
        if err <= 0:
            return None
    return a.tolist()


# ---------------------------------------------------------------------------
# Subframe encode/decode
# ---------------------------------------------------------------------------


def _encode_subframe(
    w: BitWriter, x: np.ndarray, bps: int, prefer: str | None = None
) -> None:
    x = x.astype(np.int64)
    blocksize = len(x)
    # wasted bits: common trailing zeros across all samples (real FLAC
    # behavior; also keeps the decoder path exercised)
    wasted = 0
    if np.any(x):
        nz = x[x != 0]
        wasted = min(
            int(np.min([(int(v) & -int(v)).bit_length() - 1 for v in nz])),
            bps - 1,
        )
    if wasted > 0:
        x = x >> wasted
        bps -= wasted

    def header(type_bits: int) -> None:
        w.write(0, 1)
        w.write(type_bits, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if prefer != "verbatim" and np.all(x == x[0]):
        header(0b000000)  # CONSTANT
        w.write_signed(int(x[0]), bps)
        return
    if prefer == "verbatim":
        header(0b000001)
        for v in x.tolist():
            w.write_signed(int(v), bps)
        return
    candidates: list[tuple[int, str, object]] = []
    for order in range(0, 5):
        if blocksize <= order:
            break
        res = _fixed_residual(x, order)
        cost = int(np.sum(np.minimum(_zigzag(res), 1 << 30))) // 8
        candidates.append((cost, "fixed", (order, res)))
    if prefer == "lpc" or prefer is None:
        order = min(8, blocksize // 2)
        fl = _levinson_lpc(x, order) if order >= 1 else None
        if fl is not None:
            precision = 14
            cmax = max(abs(c) for c in fl) or 1.0
            shift = min(14, max(1, precision - 1 - int(np.ceil(np.log2(cmax)))))
            q = [
                max(
                    -(1 << (precision - 1)),
                    min((1 << (precision - 1)) - 1, int(round(c * (1 << shift)))),
                )
                for c in fl
            ]
            res = _lpc_residual(x, q, shift)
            cost = int(np.sum(np.minimum(_zigzag(res), 1 << 30))) // 8
            if prefer == "lpc":
                cost = -1  # force
            candidates.append((cost, "lpc", (q, shift, res)))
    candidates.sort(key=lambda t: t[0])
    cost, kind, info = candidates[0]
    if kind == "fixed":
        order, res = info
        header(0b001000 | order)
        for v in x[:order].tolist():
            w.write_signed(int(v), bps)
        _write_residual(w, res, blocksize, order)
    else:
        q, shift, res = info
        order = len(q)
        header(0b100000 | (order - 1))
        for v in x[:order].tolist():
            w.write_signed(int(v), bps)
        w.write(14 - 1, 4)  # precision-1
        w.write(shift, 5)
        for c in q:
            w.write_signed(c, 14)
        _write_residual(w, res, blocksize, order)


def _decode_subframe(r: BitReader, blocksize: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise ValueError("flac: bad subframe padding bit")
    type_bits = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if bps <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if type_bits == 0b000000:
        x = np.full(blocksize, r.read_signed(bps), dtype=np.int64)
    elif type_bits == 0b000001:
        x = np.array(
            [r.read_signed(bps) for _ in range(blocksize)], dtype=np.int64
        )
    elif 0b001000 <= type_bits <= 0b001100:
        order = type_bits & 0b111
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        x = _fixed_restore(warm, res, order)
    elif type_bits >= 0b100000:
        order = (type_bits & 0b11111) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid lpc precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative lpc shift is reserved")
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        x = _lpc_restore(warm, res, coefs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {type_bits:06b}")
    return x << wasted if wasted else x


# ---------------------------------------------------------------------------
# Stream encode
# ---------------------------------------------------------------------------


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    block_size: int = 64,
    force_modes: bool = True,
) -> bytes:
    """Encode int16 PCM (shape (n,) mono or (n, channels)) to a FLAC stream.

    ``force_modes`` cycles subframe/stereo strategies frame-over-frame
    (independent -> mid/side -> left/side -> right/side; a verbatim and an
    LPC frame early on) so every decoder path is exercised by any fixture
    longer than a few frames — coverage via the format itself, the same
    trick the JPEG fixture uses for quant tables.
    """
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if not (1 <= channels <= 2):
        raise ValueError("flac encoder: 1 or 2 channels")
    if n == 0:
        raise ValueError("flac encoder: empty input")
    if np.any(x > 32767) or np.any(x < -32768):
        raise ValueError("flac encoder: samples must be int16-range")
    bps = 16

    md5 = hashlib.md5(
        x.astype("<i2").tobytes()  # interleaved little-endian, as decoded
    ).digest()

    out = bytearray()
    out += FLAC_MAGIC
    # STREAMINFO (last metadata block, type 0, 34 bytes)
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.getvalue() + md5
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, block_size):
        blk = x[start : start + block_size]
        bs = len(blk)
        if channels == 2 and force_modes:
            assignment = (8, 9, 10, channels - 1)[frame_no % 4]
        elif channels == 2:
            assignment = channels - 1
        else:
            assignment = 0
        prefer = None
        if force_modes and frame_no == 1:
            prefer = "verbatim"
        elif force_modes and frame_no == 2:
            prefer = "lpc"

        w = BitWriter()
        w.write(SYNC_CODE, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize stream: frame number coded
        w.write(0b0111, 4)  # blocksize: 16 bits at end of header
        w.write(0b0000, 4)  # sample rate: from STREAMINFO
        w.write(assignment, 4)
        w.write(0b100, 3)  # 16-bit samples
        w.write(0, 1)  # reserved
        for b in encode_utf8_number(frame_no):
            w.write(b, 8)
        w.write(bs - 1, 16)
        hdr = w.buf[:]
        w.write(crc8(bytes(hdr)), 8)

        if assignment <= 7:
            chans = [(blk[:, c], bps) for c in range(channels)]
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if assignment == 8:  # left/side
                chans = [(left, bps), (side, bps + 1)]
            elif assignment == 9:  # right/side
                chans = [(side, bps + 1), (right, bps)]
            else:  # mid/side
                mid = (left + right) >> 1
                chans = [(mid, bps), (side, bps + 1)]
        for cx, cbps in chans:
            _encode_subframe(w, cx, cbps, prefer=prefer)
        w.pad_to_byte()
        frame = w.getvalue()
        out += frame + struct.pack(">H", crc16(frame))
        frame_no += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Stream decode
# ---------------------------------------------------------------------------


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream -> (samples shape (n, channels) int32,
    sample_rate).  Verifies frame CRC-8/CRC-16 and the STREAMINFO MD5 of
    the decoded PCM — a corrupted stream raises, never returns wrong
    samples silently."""
    if payload[:4] != FLAC_MAGIC:
        raise ValueError("flac: bad magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata")
        hdr = payload[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("flac: truncated metadata body")
        if btype == 0:
            if length != 34:
                raise ValueError("flac: STREAMINFO must be 34 bytes")
            r = BitReader(body)
            r.read(16)  # min block size
            r.read(16)  # max block size
            r.read(24)
            r.read(24)
            rate = r.read(20)
            channels = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = body[18:34]
            streaminfo = (rate, channels, bps, total, md5)
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac: missing STREAMINFO")
    rate, channels, bps, total, md5 = streaminfo
    if bps != 16:
        raise ValueError("flac: only 16-bit streams supported")

    frames: list[np.ndarray] = []
    got = 0
    frame_idx = 0
    while got < total:
        r = BitReader(payload, pos)
        if r.read(14) != SYNC_CODE:
            raise ValueError("flac: lost frame sync")
        if r.read(1) != 0:
            raise ValueError("flac: reserved header bit set")
        variable_blocking = r.read(1)  # number semantics: frame vs sample
        bs_code = r.read(4)
        sr_code = r.read(4)
        assignment = r.read(4)
        ss_code = r.read(3)
        if r.read(1) != 0:
            raise ValueError("flac: reserved header bit set")
        coded_number = decode_utf8_number(r)
        # A spliced/reordered stream can carry per-frame-valid CRCs; the
        # coded frame/sample number is the spec's ordering witness — check
        # it here so the error is precise, not a generic final-MD5 miss.
        expected = got if variable_blocking else frame_idx
        if coded_number != expected:
            kind = "sample" if variable_blocking else "frame"
            raise ValueError(
                f"flac: frame out of sequence — coded {kind} number "
                f"{coded_number}, expected {expected}"
            )
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("flac: reserved blocksize code")
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code == 0b1111:
            raise ValueError("flac: invalid sample rate code")
        if ss_code == 0b100:
            fbps = 16
        elif ss_code == 0b000:
            fbps = bps
        else:
            raise ValueError("flac: unsupported sample size code")
        header_end = r.pos  # bit-aligned: header is whole bytes
        if crc8(payload[pos:header_end]) != r.read(8):
            raise ValueError("flac: frame header CRC-8 mismatch")

        if assignment <= 7:
            nch = assignment + 1
            if nch != channels:
                raise ValueError("flac: channel count mismatch")
            cols = [
                _decode_subframe(r, bs, fbps) for _ in range(nch)
            ]
        elif assignment in (8, 9, 10):
            if channels != 2:
                raise ValueError("flac: stereo assignment in non-stereo stream")
            w0 = fbps + (1 if assignment == 9 else 0)
            w1 = fbps + (1 if assignment in (8, 10) else 0)
            c0 = _decode_subframe(r, bs, w0)
            c1 = _decode_subframe(r, bs, w1)
            if assignment == 8:  # left/side
                left, side = c0, c1
                right = left - side
            elif assignment == 9:  # right/side
                side, right = c0, c1
                left = side + right
            else:  # mid/side
                mid, side = c0, c1
                m2 = (mid << 1) | (side & 1)
                left = (m2 + side) >> 1
                right = (m2 - side) >> 1
            cols = [left, right]
        else:
            raise ValueError("flac: reserved channel assignment")
        r.align()
        frame_end = r.pos
        if crc16(payload[pos:frame_end]) != int.from_bytes(
            payload[frame_end : frame_end + 2], "big"
        ):
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = frame_end + 2
        frames.append(np.stack(cols, axis=1))
        got += bs
        frame_idx += 1

    if got != total:
        raise ValueError("flac: sample count mismatch")
    pcm = np.concatenate(frames, axis=0) if frames else np.zeros((0, channels))
    if np.any(pcm > 32767) or np.any(pcm < -32768):
        raise ValueError("flac: decoded sample out of 16-bit range")
    if hashlib.md5(pcm.astype("<i2").tobytes()).digest() != md5:
        raise ValueError("flac: decoded-PCM MD5 mismatch")
    return pcm.astype(np.int32), rate
