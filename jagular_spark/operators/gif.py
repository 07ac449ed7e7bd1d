"""GIF87a/89a codec, pure Python + numpy, from the public GIF
specification (CompuServe GIF89a, 1990): logical screen descriptor,
global/local color tables, sub-block framing, the 4-pass interlace
layout, and the GIF variant of LZW (variable code width 3..12 bits,
LSB-first packing, clear/end codes, 4096-entry dictionary reset).

- decode: every image block of a (possibly animated) stream → list of
  (h, w, 3) uint8 RGB frames via its color table (local over global);
  graphic-control extensions are parsed and skipped (no disposal
  compositing — frames come back raw, which is what feature kernels
  want). Interlaced images are de-interlaced.
- encode: single-frame grayscale with the identity 256-gray palette —
  GIF is lossless, so decode(encode(img)) == img exactly, which is what
  lets the driver oracle hash-verify the roundtrip like PNG.

Reference parity note: the reference engine (kemerelab/jagular) has no
media operators — this module serves the builder-brief multimodal
requirement, not reference parity.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


class _LZWWriter:
    """LSB-first variable-width code packer feeding 255-byte sub-blocks."""

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        blocks = bytearray()
        for i in range(0, len(self.out), 255):
            chunk = self.out[i : i + 255]
            blocks.append(len(chunk))
            blocks += chunk
        blocks.append(0)  # block terminator
        return bytes(blocks)


def lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW: emit CLEAR, build the string table greedily, bump the
    code width when the next code no longer fits, reset at 4096.

    The table is keyed on ``(prefix code, next byte)`` int pairs (the
    classic trick) instead of the prefix BYTES: the byte-string form
    re-hashed an O(len) key per pixel — quadratic on long matches,
    which repetitive text payloads produce constantly. Identical code
    sequence by construction (a prefix string and its table code are
    one-to-one between resets)."""
    indices = np.asarray(indices, dtype=np.uint8)  # tobytes() below is 1 B/px
    clear = 1 << min_code_size
    end = clear + 1
    bw = _LZWWriter()
    width = min_code_size + 1
    bw.put(clear, width)
    data = indices.tobytes()
    if not data:
        bw.put(end, width)
        return bw.finish()
    table: dict[tuple[int, int], int] = {}
    nxt = end + 1
    get = table.get
    cur = data[0]
    for px in data[1:]:
        code = get((cur, px))
        if code is not None:
            cur = code
            continue
        bw.put(cur, width)
        table[(cur, px)] = nxt
        nxt += 1
        if nxt > (1 << width) and width < 12:
            width += 1
        if nxt == 4096:
            bw.put(clear, width)
            table, nxt, width = {}, end + 1, min_code_size + 1
            get = table.get
        cur = px
    bw.put(cur, width)
    bw.put(end, width)
    return bw.finish()


def lzw_decompress(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of :func:`lzw_compress`; stops at END or after
    ``n_expected`` pixels (defensive against trailing junk)."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif_gray8(img: np.ndarray) -> bytes:
    """GIF89a encode of an (h, w) uint8 grayscale image with the
    identity 256-gray global palette — lossless, deterministic."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_gif_gray8 expects an (h, w) grayscale array")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    out = bytearray(b"GIF89a")
    # logical screen: global color table, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):  # identity gray palette
        out += bytes([i, i, i])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    out += bytes([8])  # LZW min code size
    out += lzw_compress(img.reshape(-1), 8)
    out += b"\x3b"  # trailer
    return bytes(out)


def _deinterlace(rows: np.ndarray, h: int) -> np.ndarray:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def decode_gif(payload: bytes):
    """Decode every image block. Returns ``(frames, w, h)`` where
    ``frames`` is a list of (fh, fw, 3) uint8 RGB arrays (one per image
    block, palette applied, de-interlaced; animation frames are NOT
    composited onto the logical screen — each comes back as stored)."""
    d = payload
    if d[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing signature)")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", d[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(d[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    while pos < len(d):
        b = d[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(d) and d[pos] != 0:
                pos += 1 + d[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _l, _t, fw, fh, iflags = struct.unpack("<HHHHB", d[pos + 1 : pos + 10])
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(d[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("image block without any color table")
            mcs = d[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(d) and d[pos] != 0:
                n = d[pos]
                lzw += d[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = lzw_decompress(bytes(lzw), mcs, fw * fh).reshape(fh, fw)
            if iflags & 0x40:
                idx = _deinterlace(idx, fh)
            frames.append(ct[np.minimum(idx, len(ct) - 1)])
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    if not frames:
        raise ValueError("GIF has no image blocks")
    return frames, w, h


def decode_gif_gray(payload: bytes) -> np.ndarray:
    """First frame as (h, w) uint8 luma (ITU BT.601 integer rounding on
    the palette RGB; exact identity for the gray-palette encoder)."""
    frames, _w, _h = decode_gif(bytes(payload))
    f = frames[0].astype(np.float64)
    return np.clip(
        np.rint(0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]),
        0, 255,
    ).astype(np.uint8)
