"""Motion-JPEG in a RIFF/AVI container, pure Python — the public
Microsoft RIFF/AVI layout (avih/strh/strf headers, 'movi' LIST of
per-frame '00dc' chunks, 'idx1' index) carrying baseline-JPEG frames
from operators/jpeg.py. With JPEG real, this makes VIDEO a genuine
compressed path end-to-end (encode frames → container → parse → frame
decode) instead of synthetic raw bytes; only inter-frame codecs that
genuinely need external libraries (H.264) remain stubbed behind the
``extra_codecs`` seam in operators/multimodal.py.

Determinism: the container bytes are a pure function of the frame
payloads + (w, h, fps); the decoder walks chunk headers only (no
tolerance heuristics), so the same payload always yields the same
frame list on every worker.

Reference parity note: the reference engine (kemerelab/jagular) has no
media operators — this module serves the builder-brief multimodal
requirement, not reference parity.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: fourcc, little-endian size, payload, pad byte to
    even length (RIFF sizes exclude the pad)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Pack pre-encoded JPEG frame payloads into a minimal, spec-shaped
    AVI: RIFF('AVI ' LIST(hdrl avih LIST(strl strh strf)) LIST(movi
    '00dc'...) idx1). Every header field a player actually reads is
    populated (frame count, rate/scale, dims, 'MJPG' biCompression);
    sizes and the idx1 offsets follow the RIFF rules exactly."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)
    # avih: MainAVIHeader (56 bytes)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,   # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        n,                 # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_bytes,         # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,        # dwReserved[4]
    )
    # strh: AVIStreamHeader (56 bytes): fccType 'vids', handler 'MJPG'
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0,                 # dwFlags
            0, 0,              # wPriority, wLanguage
            0,                 # dwInitialFrames
            1, fps,            # dwScale, dwRate -> fps frames/s
            0, n,              # dwStart, dwLength
            max_bytes,         # dwSuggestedBufferSize
            0xFFFFFFFF,        # dwQuality (default)
            0,                 # dwSampleSize (varies per frame)
            0, 0,              # rcFrame left, top
            width, height,     # rcFrame right, bottom
        )
    )
    # strf: BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_chunks)
    # idx1: one AVIINDEXENTRY per frame; offsets are relative to the
    # 'movi' list-type fourcc (the common convention)
    idx, off = b"", 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", idx)
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_avi_mjpeg(payload: bytes) -> tuple[list[bytes], int, int, int]:
    """Parse an AVI and return (jpeg_frames, width, height, fps).
    Walks the RIFF chunk tree exactly: hdrl/avih for dims, strh for the
    rate/scale pair, the 'movi' LIST for '00dc'/'00db' frame chunks
    (ignoring 'rec ' sub-lists and the idx1 index). Raises ValueError
    on a malformed container, NotImplementedError on a non-MJPG video
    stream."""
    d = payload
    if d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    width = height = 0
    fps = 0
    frames: list[bytes] = []
    compression = b""

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, fps, compression
        while pos + 8 <= end:
            fourcc = d[pos : pos + 4]
            (size,) = struct.unpack("<I", d[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError("chunk overruns its parent")
            if fourcc == b"LIST":
                walk(body_start + 4, body_end)  # skip the list type
            elif fourcc == b"avih":
                w, h = struct.unpack("<II", d[body_start + 32 : body_start + 40])
                width, height = int(w), int(h)
            elif fourcc == b"strh":
                if d[body_start : body_start + 4] == b"vids":
                    scale, rate = struct.unpack(
                        "<II", d[body_start + 20 : body_start + 28]
                    )
                    fps = int(rate // scale) if scale else 0
            elif fourcc == b"strf":
                compression = d[body_start + 16 : body_start + 20]
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(bytes(d[body_start:body_end]))
            pos = body_end + (size % 2)

    (riff_size,) = struct.unpack("<I", d[4:8])
    walk(12, min(8 + riff_size, len(d)))
    if compression not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI video stream compression {compression!r}: only MJPG supported"
        )
    if not frames:
        raise ValueError("AVI has no video frame chunks")
    return frames, width, height, fps
