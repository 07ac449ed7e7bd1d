"""GIF codec: hand-built spec vectors (streams written from the GIF89a
spec, independent of the encoder), LZW edge cases, interlace,
animation, and the Spark roundtrip operator."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from jagular_spark.operators.gif import (
    decode_gif,
    decode_gif_gray,
    encode_gif_gray8,
    lzw_compress,
    lzw_decompress,
)


def _pack_codes(codes_widths) -> bytes:
    """LSB-first packer, test-local on purpose."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_widths:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        c = data[i : i + 255]
        out.append(len(c))
        out += c
    out.append(0)
    return bytes(out)


def _gif(w, h, palette, image_blocks, sig=b"GIF89a") -> bytes:
    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    out = bytearray(sig)
    out += struct.pack("<HHBBB", w, h, 0x80 | ((8 - 1) << 4) | (depth - 1), 0, 0)
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * (3 * ((2 << (depth - 1)) - n))
    out += pal
    for blk in image_blocks:
        out += blk
    out += b"\x3b"
    return bytes(out)


def test_hand_built_2color_stream():
    """2x2 checkerboard, 2-color palette, min code size 2 (the spec
    floor): codes written BY HAND — clear=4, end=5, literals at width
    3. Exercises signature, descriptor, palette, LZW bootstrap."""
    # width bumps to 4 after the 3rd data code (table reaches 8 entries)
    codes = [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)]
    img = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2]) + _subblocks(_pack_codes(codes))
    )
    g = _gif(2, 2, [(0, 0, 0), (255, 255, 255)], [img])
    frames, w, h = decode_gif(g)
    assert (w, h) == (2, 2)
    exp = np.array([[0, 255], [255, 0]], dtype=np.uint8)
    assert (frames[0][:, :, 0] == exp).all()
    assert (frames[0][:, :, 1] == exp).all()


def test_hand_built_kwkwk_case():
    """The deferred-entry LZW case: code == len(table) right after a
    literal (the classic KwKwK). Stream: clear, 0, 6(=first new entry
    '00'), end over a 4-color table -> pixels 0,0,0."""
    codes = [(4, 3), (0, 3), (6, 3), (5, 3)]
    img = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
        + bytes([2]) + _subblocks(_pack_codes(codes))
    )
    g = _gif(3, 1, [(9, 9, 9), (1, 1, 1)], [img])
    frames, _, _ = decode_gif(g)
    assert (frames[0][:, :, 0] == 9).all()


def test_hand_built_interlace():
    """4-row interlaced image: rows stored in pass order 0, 2 (pass 3
    covers row 2 at step 4? no — for h=4: pass1 row 0, pass3 row 2,
    pass4 rows 1 and 3) must come back in display order."""
    # rows in display order have constant colors 0,1,2,3 (palette idx)
    # storage order for h=4: row0 (pass1: 0,8,..), row2 (pass3: 2,6,..),
    # row1, row3 (pass4: 1,3,..)
    storage = [0, 2, 1, 3]
    idx_rows = [bytes([r, r]) for r in storage]
    pixels = b"".join(idx_rows)
    # literal-only LZW at mcs 2: clear, then each pixel, re-clearing to
    # keep widths trivial is unnecessary (8 literals fit before growth
    # matters at width 3? table grows: after 7 appends len hits 8 ->
    # width 4). Just compress with the library for this vector...
    data = lzw_compress(np.frombuffer(pixels, dtype=np.uint8), 2)
    img = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 4, 0x40)  # interlaced
        + bytes([2]) + data
    )
    pal = [(0, 0, 0), (10, 10, 10), (20, 20, 20), (30, 30, 30)]
    g = _gif(2, 4, pal, [img])
    frames, _, _ = decode_gif(g)
    got = frames[0][:, 0, 0].tolist()
    assert got == [0, 10, 20, 30]


def test_animation_and_extensions_and_local_table():
    """Two image blocks with a graphic-control extension between them;
    the second uses a LOCAL color table overriding the global one."""
    d1 = lzw_compress(np.array([0, 1], dtype=np.uint8), 2)
    img1 = b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0) + bytes([2]) + d1
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    lpal = bytes([100, 0, 0, 0, 100, 0]) + b"\x00" * 0
    d2 = lzw_compress(np.array([1, 0], dtype=np.uint8), 2)
    img2 = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0x80 | 0)  # local table, 2 entries
        + lpal + bytes([2]) + d2
    )
    g = _gif(2, 1, [(5, 5, 5), (250, 250, 250)], [img1, gce + img2])
    frames, w, h = decode_gif(g)
    assert len(frames) == 2
    assert frames[0][0, 0, 0] == 5 and frames[0][0, 1, 0] == 250
    assert tuple(frames[1][0, 0]) == (0, 100, 0)  # local palette idx 1
    assert tuple(frames[1][0, 1]) == (100, 0, 0)


def test_gif_roundtrip_exact_across_shapes():
    """Lossless: decode(encode(img)) == img exactly, including sizes
    that force LZW width growth and full 4096-dict resets."""
    rng = np.random.default_rng(4)
    for shape in [(1, 1), (8, 8), (13, 21), (3, 500), (200, 300)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (decode_gif_gray(encode_gif_gray8(img)) == img).all(), shape
    flat = np.zeros((100, 100), dtype=np.uint8)
    assert (decode_gif_gray(encode_gif_gray8(flat)) == flat).all()


def test_lzw_raw_roundtrip_small_code_sizes():
    rng = np.random.default_rng(5)
    for mcs in (2, 3, 4, 7, 8):
        idx = rng.integers(0, 1 << mcs, 5000).astype(np.uint8)
        blocks = lzw_compress(idx, mcs)
        # unwrap sub-blocks the way the container parser does
        raw = bytearray()
        pos = 0
        while blocks[pos] != 0:
            n = blocks[pos]
            raw += blocks[pos + 1 : pos + 1 + n]
            pos += 1 + n
        out = lzw_decompress(bytes(raw), mcs, len(idx))
        assert (out == idx).all(), mcs


def test_gif_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"JFIF nonsense")
    with pytest.raises(ValueError, match="no image"):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b")


def test_gif_through_production_decode_and_operator(spark):
    """The production _decode_payload gif path is the exact identity on
    gray-palette containers, and the Spark roundtrip operator emits
    exact raw-byte stats."""
    from jagular_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        gif_roundtrip_stats,
    )

    rng = np.random.default_rng(6)
    buf = rng.integers(0, 256, 300, dtype=np.uint8)
    rows = [(3, "image", "raw8", bytearray(buf.tobytes()), 300, 1, 1, 0)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = gif_roundtrip_stats(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n_bytes == 300
    assert r.byte_sum == int(buf.sum(dtype=np.int64))
    assert abs(r.mean_px - r.byte_sum / (300 * 255)) < 1e-15
