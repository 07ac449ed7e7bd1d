"""FLAC codec (subset), pure Python + numpy, from the public xiph.org
FLAC format specification — the lossless compressed-audio format real
speech corpora ship (LibriSpeech et al.).

- decode: STREAMINFO + metadata walk, frame sync + header (block size /
  sample rate / channel assignment / sample size codes, UTF-8-coded
  frame number, CRC-8), subframes CONSTANT / VERBATIM / FIXED(0-4) /
  LPC(1-32) with wasted bits, Rice/Rice2 partitioned residuals
  (incl. escape partitions), inter-channel decorrelation
  (left/side, right/side, mid/side), frame CRC-16 verification.
- encode: 16-bit mono or stereo (independent or mid/side), fixed
  blocking, per-frame best fixed predictor (order 0-2) with one-
  partition Rice residuals — a genuine compressing encoder whose
  output any FLAC decoder reads; lossless, so decode(encode(x)) == x
  exactly and the driver oracle hash-verifies the roundtrip.

Reference parity note: the reference engine (kemerelab/jagular) has no
media operators — this module serves the builder-brief multimodal
requirement, not reference parity.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {}  # code -> fixed size (None = read bits)
for _i in range(2, 6):
    _BLOCKSIZE_CODES[_i] = 576 << (_i - 2)
for _i in range(8, 16):
    _BLOCKSIZE_CODES[_i] = 256 << (_i - 8)

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _make_crc8_table() -> list[int]:
    tbl = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        tbl.append(crc)
    return tbl


def _make_crc16_table() -> list[int]:
    tbl = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
        tbl.append(crc)
    return tbl


# byte-at-a-time CRC tables (r18: the per-bit loops were ~20% of the
# FLAC roundtrip kernel; the table form computes the identical
# polynomial division, verified bit-for-bit in tests/test_flac.py)
_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def _crc8(data: bytes) -> int:
    crc = 0
    tbl = _CRC8_TABLE
    for b in data:
        crc = tbl[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    tbl = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ tbl[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    """MSB-first bit packer (FLAC bit order)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        nb = self.nbits + nbits
        if nb >= 8:
            # emit all whole bytes with ONE to_bytes instead of a
            # per-byte shift/append loop (r18: the loop dominated the
            # chunked Rice flushes, where acc holds 256+ bits)
            rem = nb & 7
            self.buf += (acc >> rem).to_bytes(nb >> 3, "big")
            acc &= (1 << rem) - 1
            nb = rem
        self.acc = acc
        self.nbits = nb

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader (r18: windowed — each field is one
    ``int.from_bytes`` slice at a bit cursor instead of a per-byte
    accumulate loop, and ``_peek16``/``_peek32`` give the zero-padded
    lookahead the unary scan and the fused Rice path use. ``pad`` lets
    a caller that builds many readers over ONE buffer share the padded
    copy instead of re-copying the stream per frame)."""

    def __init__(self, data: bytes, pos: int = 0, pad: bytes | None = None) -> None:
        self.data = data
        self.pos = pos << 3  # bit position
        self._pad = pad if pad is not None else data + b"\x00" * 8
        self._nbits = len(data) * 8

    def read(self, nbits: int) -> int:
        p = self.pos
        if p + nbits > self._nbits:
            raise ValueError("FLAC bitstream truncated")
        off = p & 7
        b0 = p >> 3
        nb = (off + nbits + 7) >> 3
        v = int.from_bytes(self.data[b0 : b0 + nb], "big")
        self.pos = p + nbits
        return (v >> ((nb << 3) - off - nbits)) & ((1 << nbits) - 1)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def _peek16(self) -> int:
        p = self.pos
        b0 = p >> 3
        v = int.from_bytes(self._pad[b0 : b0 + 3], "big")
        return (v >> (8 - (p & 7))) & 0xFFFF

    def _peek32(self) -> int:
        p = self.pos
        b0 = p >> 3
        v = int.from_bytes(self._pad[b0 : b0 + 5], "big")
        return (v >> (8 - (p & 7))) & 0xFFFFFFFF

    def read_unary(self) -> int:
        q = 0
        while True:
            w = self._peek16()
            if w:
                z = 16 - w.bit_length()
                p2 = self.pos + z + 1
                if p2 > self._nbits:
                    raise ValueError("FLAC bitstream truncated")
                self.pos = p2
                return q + z
            if self.pos + 16 > self._nbits:
                # all remaining bits are zero: the per-bit reader would
                # consume them and then hit the end of the stream
                raise ValueError("FLAC bitstream truncated")
            self.pos += 16
            q += 16

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def tell_bytes(self) -> int:
        return (self.pos + 7) >> 3


def _utf8_number(bw: _BitWriter, n: int) -> None:
    """The FLAC frame-number coding (UTF-8-style, up to 36 bits)."""
    if n < 0x80:
        bw.write(n, 8)
        return
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC), (7, 0xFE)):
        if n < (1 << (5 * nbytes + 1)) or nbytes == 7:
            cont = [(n >> (6 * i)) & 0x3F for i in range(nbytes - 1)]
            bw.write(lead | (n >> (6 * (nbytes - 1))), 8)
            for c in reversed(cont):
                bw.write(0x80 | c, 8)
            return


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n_cont):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 coded frame number")
        v = (v << 6) | (c & 0x3F)
    return v


def _zigzag(e: np.ndarray) -> np.ndarray:
    return np.where(e >= 0, 2 * e, -2 * e - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u >> 1) + 1)


# ---------------------------------------------------------------------------
# Encoder (16-bit, fixed blocking)
# ---------------------------------------------------------------------------


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    """One FIXED-predictor subframe: pick the order 0-2 with the
    smallest residual-magnitude sum, one Rice partition (order 0)."""
    x = x.astype(np.int64)
    n = len(x)
    if n and (x == x[0]).all():
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best, best_res = 0, x.copy()
    best_cost = np.abs(x).sum()
    for order in (1, 2):
        if n <= order:
            break
        res = x.copy()
        for _ in range(order):
            res = np.diff(res)
        cost = np.abs(res).sum() + order * bps
        if cost < best_cost:
            best, best_res, best_cost = order, res, cost
    order = best
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)  # FIXED, order
    bw.write(0, 1)  # no wasted bits
    for i in range(order):
        bw.write(int(x[i]) & ((1 << bps) - 1), bps)
    res = best_res
    # residual: method 0 (4-bit Rice), partition order 0
    bw.write(0, 2)
    bw.write(0, 4)
    if len(res):
        mean = max(1.0, float(np.abs(res).mean()))
        param = min(14, max(0, int(np.ceil(np.log2(mean))) + 1))
    else:
        param = 0
    zz = _zigzag(res)
    if len(zz) and int(zz.max()) >> param > 60:  # pathological: escape raw
        bw.write(0xF, 4)
        width = max(1, int(int(np.abs(res).max()).bit_length()) + 1)
        bw.write(width, 5)
        wmask = (1 << width) - 1
        for v in res.tolist():
            bw.write(v & wmask, width)
        return
    bw.write(param, 4)
    # fused Rice write: q zeros + stop bit + remainder is the single
    # value (1 << param) | rem at width q + 1 + param, ACCUMULATED into
    # one (acc, nbits) pair flushed every >=256 bits — the same code
    # concatenation in ~1/32 of the writer calls (bit-identical; the
    # per-sample call was the top cost of the encode half). tolist()
    # iterates Python ints instead of numpy scalar boxes; the rare
    # huge-quotient case flushes and keeps the chunked unary writer.
    mask = (1 << param) - 1
    stop = 1 << param
    write = bw.write
    acc, nb = 0, 0
    for u in zz.tolist():
        q = u >> param
        if q < 48:
            ln = q + 1 + param
            acc = (acc << ln) | stop | (u & mask)
            nb += ln
            if nb >= 256:
                write(acc, nb)
                acc, nb = 0, 0
        else:
            if nb:
                write(acc, nb)
                acc, nb = 0, 0
            bw.write_unary(q)
            write(u & mask, param)
    if nb:
        write(acc, nb)


def encode_flac_pcm16(
    samples: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 4096,
    mid_side: bool = False,
) -> bytes:
    """FLAC encode of int16 samples — shape (n,) mono or (n, 2) stereo.
    Fixed blocking, FIXED-predictor subframes, Rice residuals;
    ``mid_side`` selects the mid/side stereo decorrelation."""
    samples = np.asarray(samples, dtype=np.int16)
    stereo = samples.ndim == 2
    if stereo and samples.shape[1] != 2:
        raise ValueError("stereo input must be (n, 2)")
    n = len(samples)
    n_ch = 2 if stereo else 1
    interleaved = samples.reshape(-1).astype("<i2").tobytes()
    md5 = hashlib.md5(interleaved).digest()

    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(n_ch - 1, 3)
    info.write(15, 5)  # bps - 1 = 15
    info.write(n, 36)
    body = info.bytes() + md5
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body  # last block

    for fi, start in enumerate(range(0, max(n, 1), block_size)):
        blk = samples[start : start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking
        hdr.write(7, 4)  # block size: 16-bit at end of header
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        if not stereo:
            hdr.write(0, 4)  # 1 channel
        elif mid_side:
            hdr.write(10, 4)  # mid/side
        else:
            hdr.write(1, 4)  # 2 channels independent
        hdr.write(4, 3)  # sample size: 16-bit
        hdr.write(0, 1)  # reserved
        _utf8_number(hdr, fi)
        hdr.write(bs - 1, 16)
        hbytes = hdr.bytes()
        frame = bytearray(hbytes)
        frame.append(_crc8(frame))

        sw = _BitWriter()
        if not stereo:
            _encode_subframe(sw, blk.astype(np.int64), 16)
        elif mid_side:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            mid = (left + right) >> 1
            side = left - right
            _encode_subframe(sw, mid, 16)
            _encode_subframe(sw, side, 17)  # side carries one extra bit
        else:
            _encode_subframe(sw, blk[:, 0].astype(np.int64), 16)
            _encode_subframe(sw, blk[:, 1].astype(np.int64), 16)
        sw.align()
        frame += sw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decode_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if bs % nparts:
        raise ValueError("block size not divisible by partition count")
    res: list[int] = []
    append = res.append
    for p in range(nparts):
        cnt = bs // nparts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            width = br.read(5)
            for _ in range(cnt):
                append(br.read_signed(width) if width else 0)
        else:
            # fused Rice read: ONE 32-bit peek covers the unary prefix,
            # stop bit and remainder of the common case (identical
            # value/position semantics to read_unary + read; the long-
            # quotient tail falls back to them)
            mask = (1 << param) - 1
            peek32 = br._peek32
            nbits_total = br._nbits
            for _ in range(cnt):
                w = peek32()
                if w:
                    z = 32 - w.bit_length()
                    tot = z + 1 + param
                    if tot <= 32:
                        p2 = br.pos + tot
                        if p2 > nbits_total:
                            raise ValueError("FLAC bitstream truncated")
                        br.pos = p2
                        u = (z << param) | ((w >> (32 - tot)) & mask)
                        append(
                            (u >> 1) if (u & 1) == 0 else -((u >> 1) + 1)
                        )
                        continue
                q = br.read_unary()
                u = (q << param) | br.read(param)
                append(_unzigzag(u))
    return np.array(res, dtype=np.int64)


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
    if t == 0:  # CONSTANT
        v = br.read_signed(bps)
        out = np.full(bs, v, dtype=np.int64)
    elif t == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        if order == 0:
            out = res
        elif bs > order:
            # res = diff^order(x); invert with `order` exact int64
            # cumsums (identical recurrence to the per-sample fixed-
            # predictor loop, vectorized — r18). Boundary values of
            # each difference level come from the warm-up samples.
            lvls = [np.array(warm, dtype=np.int64)]
            for _ in range(1, order):
                lvls.append(np.diff(lvls[-1]))
            cur = res
            for j in range(order - 1, -1, -1):
                first = int(lvls[j][0])
                cur = np.concatenate(([first], first + np.cumsum(cur)))
            out = cur
    elif t >= 32:  # LPC
        order = (t & 31) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read_signed(5)
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, bs, order)
        out = np.empty(bs, dtype=np.int64)
        out[:order] = warm
        for i in range(order, bs):
            acc = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coefs))
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {t}")
    return out << wasted


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream. Returns ``(samples, sample_rate)`` —
    samples (n,) int32 for mono, (n, 2) for stereo. Frame CRC-16s are
    verified; a mismatch raises."""
    d = payload
    if d[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    sample_rate = n_ch = bps = 0
    total = 0
    last = False
    while not last:
        hdr = d[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + d[pos + 1 : pos + 4])
        body = d[pos + 4 : pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            sample_rate = br.read(20)
            n_ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        pos += 4 + ln
    if bps != 16:
        raise NotImplementedError(f"{bps}-bit FLAC (16-bit supported)")

    chans: list[list[np.ndarray]] = [[] for _ in range(n_ch)]
    got = 0
    dpad = d + b"\x00" * 8  # shared lookahead pad (one copy per stream)
    while pos + 2 <= len(d) and (total == 0 or got < total):
        frame_start = pos
        br = _BitReader(d, pos, dpad)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        _read_utf8_number(br)
        if bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODES:
            bs = _BLOCKSIZE_CODES[bs_code]
        else:
            raise ValueError(f"reserved block size code {bs_code}")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        fbps = _SAMPLE_SIZE_CODES.get(ss_code, bps) if ss_code else bps
        hdr_end = br.tell_bytes()
        crc8 = br.read(8)
        if _crc8(d[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            subs = [_decode_subframe(br, bs, fbps) for _ in range(ch_code + 1)]
        elif ch_code == 8:  # left/side
            left = _decode_subframe(br, bs, fbps)
            side = _decode_subframe(br, bs, fbps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(br, bs, fbps + 1)
            right = _decode_subframe(br, bs, fbps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(br, bs, fbps)
            side = _decode_subframe(br, bs, fbps + 1)
            lr_sum = (mid << 1) | (side & 1)
            left = (lr_sum + side) >> 1
            subs = [left, left - side]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        br.align()
        body_end = br.tell_bytes()
        crc16 = struct.unpack(">H", d[body_end : body_end + 2])[0]
        if _crc16(d[frame_start:body_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = body_end + 2
        for ci, s in enumerate(subs):
            chans[ci].append(s)
        got += bs

    cols = [np.concatenate(c) if c else np.empty(0, dtype=np.int64) for c in chans]
    if total:
        cols = [c[:total] for c in cols]
    arr = cols[0] if n_ch == 1 else np.stack(cols, axis=1)
    return arr.astype(np.int32), sample_rate
