"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` payloads + typed metadata, processed with
Arrow-batched ``mapInPandas`` kernels.

The Spark-side machinery — schemas, batch iteration, vectorized numpy
decode, partition-invariant results — is real and tested. Seven codecs
are REAL, stdlib/numpy-only implementations of their public specs:
``raw8`` (raw uint8 grayscale / PCM bytes), ``png`` (zlib inflate + all
five scanline filters, :func:`decode_png`/:func:`encode_png_gray8`),
``wav`` PCM16 RIFF (:func:`decode_wav_pcm16`/:func:`encode_wav_pcm16`),
``jpeg`` baseline-sequential AND progressive (operators/jpeg.py —
Huffman + DCT from ITU T.81, decode incl. chroma subsampling, restart
markers and SOF2 multi-scan successive approximation; grayscale and
4:2:0 color encode in both profiles), plus the lossy audio pair in
operators/audio_codecs.py: ``ulaw`` (G.711 companding) and
``adpcm_ima`` (IMA 4-bit adaptive differential), both decodable in
:func:`audio_window_features`, and ``gif`` (GIF89a LZW + palettes +
interlace, operators/gif.py). Video rides a REAL RIFF/AVI Motion-JPEG
container (operators/mjpeg.py, :func:`mjpeg_roundtrip_stats`) and a
REAL MPEG-1 elementary-stream codec — intra AND motion-compensated
P pictures, gray and 4:2:0 color (operators/mpeg1.py,
:func:`mpeg1_roundtrip_stats` / :func:`mpeg1_pframe_roundtrip_stats` /
:func:`mpeg1_color_roundtrip_stats`). Codecs
genuinely needing external libraries absent from this container
(opus/h264) raise ``NotImplementedError``; swapping one in touches
exactly one function (`_decode_payload`) — the distributed plan is
unchanged.

Scale notes: payloads stay packed in Arrow buffers end-to-end (no Python
per-row loops — numpy ``frombuffer`` per batch); decode is a narrow map
(no shuffle); frame explosion emits only sampled frames. For 100 TB of
media, partition count follows input file count and
``spark.sql.files.maxPartitionBytes`` — no operator below adds a wide
dependency.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, codec string, payload binary, "
    "width int, height int, n_frames int, sample_rate int"
)

IMAGE_FEATURES_SCHEMA = "media_id long, height int, width int, mean double, std double, p99 double"
FRAME_SCHEMA = "media_id long, frame_idx int, mean double, std double"
AUDIO_WINDOW_SCHEMA = "media_id long, window_idx int, rms double, peak double, n_clipped long"


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+alpha, rgba


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib + numpy, public PNG spec): 8-bit,
    non-interlaced, color types gray/RGB/gray-alpha/RGBA, all five
    scanline filters (None/Sub/Up/Average/Paeth). Returns a
    (height, width, channels) uint8 array."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, hdr = 8, b"", None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = hdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace}: only 8-bit non-interlaced gray/RGB[A]"
        )
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG IDAT truncated")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_off + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up (vectorized; uint8 addition wraps mod 256 per spec)
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth carry left state
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def encode_png_gray8(img: np.ndarray) -> bytes:
    """Minimal PNG encoder for (h, w) uint8 grayscale (filter None per
    row, one zlib IDAT) — the media sink twin of :func:`decode_png`."""
    import struct
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-stdlib RIFF/WAVE decode (public WAV spec): PCM format 1,
    16-bit. Returns (mono int32 samples — multi-channel averaged with
    floor division, exact integer math — and the sample rate)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_channels, sample_rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt, n_channels, sample_rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format {fmt} bits {bits}: only PCM16 implemented"
                )
        elif cid == b"data":
            data = body
    if n_channels is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(
        data[: (len(data) // (2 * n_channels)) * 2 * n_channels], dtype="<i2"
    ).astype(np.int32)
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels).sum(axis=1) // n_channels
    return samples, int(sample_rate)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal mono PCM16 RIFF/WAVE encoder — sink twin of
    :func:`decode_wav_pcm16`."""
    import struct

    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_payload(
    payload: bytes,
    codec: str,
    height: int,
    width: int,
    extra_codecs: dict | None = None,
) -> np.ndarray:
    """Decode one payload to a (height, width) float array in [0, 1].

    ``raw8``: raw uint8 row-major grayscale. ``png``: real stdlib
    decode (:func:`decode_png`); multi-channel images reduce to
    grayscale with the integer luma (77R + 150G + 29B) >> 8.
    ``jpeg``: real baseline-sequential decode (operators/jpeg.py, pure
    numpy from the public T.81 spec) — the Y plane is the grayscale.
    opus/h264 need external libraries absent from this environment —
    STUB, raises NotImplementedError.

    ``extra_codecs`` is the adapter seam: ``{codec_name: fn(payload,
    height, width) -> ndarray}``. It is threaded through the operator
    entry points and CLOSURE-CAPTURED into the Arrow kernels, so
    cloudpickle ships the decoder table to every Python worker — the
    correct Spark distribution mechanism (driver-side module state
    would NOT survive into worker processes). Plugging in a real JPEG
    decoder is ``decode_image_features(df, extra_codecs={"jpeg":
    lambda p, h, w: np.asarray(PIL.Image.open(io.BytesIO(p))) / 255.0})``.
    """
    if extra_codecs and codec in extra_codecs:
        return extra_codecs[codec](payload, height, width)
    if codec == "jpeg":
        from jagular_spark.operators.jpeg import decode_jpeg_gray

        return decode_jpeg_gray(bytes(payload)) / np.float64(255.0)
    if codec == "raw8":
        need = height * width
        buf = np.frombuffer(payload, dtype=np.uint8)
        if len(buf) < need:
            buf = np.pad(buf, (0, need - len(buf)))
        return (buf[:need].reshape(height, width) / np.float64(255.0))
    if codec == "png":
        img = decode_png(bytes(payload))
        if img.shape[2] == 1:
            gray = img[:, :, 0].astype(np.int64)
        elif img.shape[2] == 2:  # gray + alpha
            gray = img[:, :, 0].astype(np.int64)
        else:  # RGB / RGBA -> integer luma
            r, g, b = (img[:, :, i].astype(np.int64) for i in range(3))
            gray = (77 * r + 150 * g + 29 * b) >> 8
        return gray / np.float64(255.0)
    if codec == "gif":
        from jagular_spark.operators.gif import decode_gif

        frames, _w, _h = decode_gif(bytes(payload))
        f = frames[0].astype(np.int64)  # palette RGB -> integer luma
        gray = (77 * f[:, :, 0] + 150 * f[:, :, 1] + 29 * f[:, :, 2]) >> 8
        return gray / np.float64(255.0)
    raise NotImplementedError(
        f"codec {codec!r}: compressed-media decoding needs an external decoder "
        "(ffmpeg), unavailable in this environment; raw8/png/jpeg/gif are "
        "implemented"
    )


def decode_image_features(
    media: DataFrame, extra_codecs: dict | None = None
) -> DataFrame:
    """Image decode + per-image feature extraction: mean/std/p99 of the
    decoded pixel array. One Arrow-batched pass, no shuffle.
    ``extra_codecs`` plugs external decoders in (see _decode_payload)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                img = _decode_payload(
                    bytes(r.payload), r.codec, r.height, r.width, extra_codecs
                )
                rows.append(
                    {
                        "media_id": r.media_id,
                        "height": img.shape[0],
                        "width": img.shape[1],
                        "mean": float(img.mean()),
                        "std": float(img.std()),
                        "p99": float(np.quantile(img, 0.99)),
                    }
                )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "image").mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


BYTE_STATS_SCHEMA = "media_id long, n_bytes bigint, byte_sum bigint, mean_px double"


def image_byte_stats(media: DataFrame) -> DataFrame:
    """Decode raw8 payloads and compute EXACT integer byte statistics
    (count, sum, and pixel mean as one double division at the end).

    This is the oracle-checkable face of the decode path: the integer
    accumulation is associativity-proof, so the result is bit-identical
    across partitionings and engines — unlike float ``mean`` whose
    summation order varies. One Arrow-batched narrow map, no shuffle;
    payloads never leave the Arrow buffers except as numpy views."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(f"codec {r.codec!r}: only raw8 decodable here")
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                n = int(buf.size)
                s = int(buf.sum(dtype=np.int64))
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_bytes": n,
                        "byte_sum": s,
                        "mean_px": float(s) / float(n * 255) if n else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, BYTE_STATS_SCHEMA)


def resize_image(
    media: DataFrame, out_h: int, out_w: int, extra_codecs: dict | None = None
) -> DataFrame:
    """Nearest-neighbor resize to (out_h, out_w), re-encoded as raw8
    bytes — shape-preserving plumbing for a real resample kernel.
    ``extra_codecs`` plugs external decoders in (see _decode_payload)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                img = _decode_payload(
                    bytes(r.payload), r.codec, r.height, r.width, extra_codecs
                )
                yi = np.clip((np.arange(out_h) * img.shape[0] / out_h).astype(int), 0, img.shape[0] - 1)
                xi = np.clip((np.arange(out_w) * img.shape[1] / out_w).astype(int), 0, img.shape[1] - 1)
                resized = (img[np.ix_(yi, xi)] * 255.0).astype(np.uint8)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": "image",
                        "codec": "raw8",
                        "payload": resized.tobytes(),
                        "width": out_w,
                        "height": out_h,
                        "n_frames": 1,
                        "sample_rate": 0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "image").mapInPandas(kernel, MEDIA_SCHEMA)


def sample_video_frames(media: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling: decode every k-th frame of a raw8 video payload
    (frames concatenated row-major) and emit per-frame stats. Only
    sampled frames are materialized."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                frame_len = r.height * r.width
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                for fi in range(0, int(r.n_frames), every_k):
                    start = fi * frame_len
                    frame = buf[start : start + frame_len]
                    if len(frame) < frame_len:
                        break
                    arr = frame / np.float64(255.0)
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": fi,
                            "mean": float(arr.mean()),
                            "std": float(arr.std()),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(kernel, FRAME_SCHEMA)


FRAME_BYTE_STATS_SCHEMA = "media_id long, frame_idx long, n_bytes bigint, byte_sum bigint, mean_px double"


def video_frame_byte_stats(media: DataFrame, every_k: int = 10) -> DataFrame:
    """Frame sampling with EXACT integer stats — the oracle-checkable
    face of the frame-sample path (same contract as image_byte_stats):
    every k-th full frame of a raw8 video payload yields (n_bytes,
    byte_sum) as integers plus one final double division. Vectorized:
    one ``frombuffer`` + reshape + row-sum per payload, only sampled
    frames are touched."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(f"codec {r.codec!r}: only raw8 decodable here")
                frame_len = r.height * r.width
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                n_full = min(int(r.n_frames), len(buf) // frame_len) if frame_len else 0
                if n_full == 0:
                    continue
                idx = np.arange(0, n_full, every_k)
                frames = buf[: n_full * frame_len].reshape(n_full, frame_len)[idx]
                sums = frames.sum(axis=1, dtype=np.int64)
                for fi, s in zip(idx, sums):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": int(fi),
                            "n_bytes": frame_len,
                            "byte_sum": int(s),
                            "mean_px": float(s) / float(frame_len * 255),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(kernel, FRAME_BYTE_STATS_SCHEMA)


def audio_window_features(media: DataFrame, window: int = 1024) -> DataFrame:
    """Windowed audio features over raw8 PCM bytes, real ``wav`` (PCM16
    RIFF) containers, or REAL compressed-audio payloads — ``ulaw``
    (G.711 companded bytes) and ``adpcm_ima`` (packed 4-bit IMA nibble
    stream, sample count in ``n_frames``) decode through
    operators/audio_codecs.py. RMS, peak, clipped count per window —
    vectorized reshape per batch; only ADPCM (stateful by nature) loops
    per sample."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from jagular_spark.operators.audio_codecs import (
            adpcm_ima_decode,
            mulaw_decode,
        )

        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec == "wav":
                    samples, _sr = decode_wav_pcm16(bytes(r.payload))
                    centered_all = samples.astype(np.float64) / 32768.0
                elif r.codec == "ulaw":
                    samples = mulaw_decode(np.frombuffer(bytes(r.payload), dtype=np.uint8))
                    centered_all = samples.astype(np.float64) / 32768.0
                elif r.codec == "adpcm_ima":
                    samples = adpcm_ima_decode(bytes(r.payload), int(r.n_frames))
                    centered_all = samples.astype(np.float64) / 32768.0
                elif r.codec == "flac":
                    from jagular_spark.operators.flac import decode_flac

                    samples, _sr = decode_flac(bytes(r.payload))
                    if samples.ndim == 2:  # stereo: feature over the mixdown
                        samples = (samples[:, 0] + samples[:, 1]) // 2
                    centered_all = samples.astype(np.float64) / 32768.0
                elif r.codec == "raw8":
                    buf = np.frombuffer(bytes(r.payload), dtype=np.uint8).astype(np.float64)
                    centered_all = (buf - 128.0) / 128.0
                else:
                    raise NotImplementedError(
                        f"codec {r.codec!r}: only raw8/wav/ulaw/adpcm_ima/flac "
                        "decodable here"
                    )
                n_win = len(centered_all) // window
                if n_win == 0:
                    continue
                centered = centered_all[: n_win * window].reshape(n_win, window)
                rms = np.sqrt((centered**2).mean(axis=1))
                peak = np.abs(centered).max(axis=1)
                clipped = (np.abs(centered) >= 0.992).sum(axis=1)
                for i in range(n_win):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "window_idx": i,
                            "rms": float(rms[i]),
                            "peak": float(peak[i]),
                            "n_clipped": int(clipped[i]),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "audio").mapInPandas(kernel, AUDIO_WINDOW_SCHEMA)


AUDIO_WINDOW_BYTE_SCHEMA = (
    "media_id long, window_idx long, sum_dev2 bigint, peak_dev bigint, "
    "n_clipped bigint, rms double"
)


def audio_window_byte_stats(media: DataFrame, window: int = 1024) -> DataFrame:
    """Windowed audio stats with EXACT integer semantics — the
    oracle-checkable face of :func:`audio_window_features` (same
    windowing): per full window of raw8 PCM bytes, deviation-from-midpoint
    sums/max/clip-count as BIGINTs plus one fixed double chain for rms
    (``sqrt(sum_dev2/window)/128`` — identical op order on both
    engines). Vectorized reshape per payload, no per-sample loop."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(f"codec {r.codec!r}: only raw8 decodable here")
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8).astype(np.int64)
                n_win = len(buf) // window
                if n_win == 0:
                    continue
                dev = buf[: n_win * window].reshape(n_win, window) - 128
                sum_dev2 = (dev * dev).sum(axis=1)
                peak = np.abs(dev).max(axis=1)
                clipped = (np.abs(dev) >= 127).sum(axis=1)
                for i in range(n_win):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "window_idx": i,
                            "sum_dev2": int(sum_dev2[i]),
                            "peak_dev": int(peak[i]),
                            "n_clipped": int(clipped[i]),
                            "rms": float(np.sqrt(float(sum_dev2[i]) / window) / 128.0),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "audio").mapInPandas(kernel, AUDIO_WINDOW_BYTE_SCHEMA)


RESIZE_PIXEL_SCHEMA = "media_id long, r long, c long, px long"


def resize_pixel_grid(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """``(media_id, r, c, px)``: nearest-neighbor-resized pixels as
    exact integer rows — the oracle-checkable face of
    :func:`resize_image` (identical index mapping ``trunc(i·in/out)``
    clipped to the edge; the raw8 byte round-trips the float decode
    bit-exactly for all 256 values, so direct byte indexing is the same
    pixel the resized payload carries)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(f"codec {r.codec!r}: only raw8 decodable here")
                h, w = int(r.height), int(r.width)
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                if h * w == 0 or len(buf) < h * w:
                    continue
                yi = np.clip((np.arange(out_h) * h / out_h).astype(int), 0, h - 1)
                xi = np.clip((np.arange(out_w) * w / out_w).astype(int), 0, w - 1)
                grid = buf[: h * w].reshape(h, w)[np.ix_(yi, xi)]
                for ri in range(out_h):
                    for ci in range(out_w):
                        rows.append(
                            {
                                "media_id": r.media_id,
                                "r": ri,
                                "c": ci,
                                "px": int(grid[ri, ci]),
                            }
                        )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "image").mapInPandas(kernel, RESIZE_PIXEL_SCHEMA)


def synthesize_media(spark: SparkSession, n_images: int = 8, n_videos: int = 2, n_audio: int = 2) -> DataFrame:
    """Deterministic synthetic media table (seeded) for tests/demos."""
    rng = np.random.default_rng(42)
    rows = []
    mid = 0
    for _ in range(n_images):
        h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
        rows.append((mid, "image", "raw8", bytes(rng.integers(0, 256, h * w, dtype=np.uint8)), w, h, 1, 0))
        mid += 1
    for _ in range(n_videos):
        h, w, nf = 8, 8, int(rng.integers(20, 40))
        rows.append((mid, "video", "raw8", bytes(rng.integers(0, 256, h * w * nf, dtype=np.uint8)), w, h, nf, 0))
        mid += 1
    for _ in range(n_audio):
        n = int(rng.integers(4000, 8000))
        rows.append((mid, "audio", "raw8", bytes(rng.integers(0, 256, n, dtype=np.uint8)), 0, 0, 0, 16000))
        mid += 1
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def png_encode_images(media: DataFrame) -> DataFrame:
    """Re-encode raw8 grayscale payloads as REAL PNG containers
    (:func:`encode_png_gray8`) — the media sink half of the PNG
    round-trip. Same media schema out, codec='png'."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b.copy()
            payloads = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(f"codec {r.codec!r}: png encode needs raw8 input")
                h, w = int(r.height), int(r.width)
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)[: h * w]
                if len(buf) < h * w:
                    buf = np.pad(buf, (0, h * w - len(buf)))
                payloads.append(encode_png_gray8(buf.reshape(h, w)))
            out["payload"] = payloads
            out["codec"] = "png"
            yield out

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def png_byte_stats(media: DataFrame) -> DataFrame:
    """:func:`image_byte_stats` for REAL PNG payloads: decode through
    :func:`decode_png` (grayscale containers), then the same exact
    integer statistics — so a lossless raw8→png→decode round-trip is
    verifiable against the raw-byte oracle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "png":
                    raise NotImplementedError(f"codec {r.codec!r}: png_byte_stats needs png")
                img = decode_png(bytes(r.payload))
                if img.shape[2] != 1:
                    raise ValueError("png_byte_stats expects grayscale containers")
                buf = img[:, :, 0].ravel()
                n = int(buf.size)
                s = int(buf.sum(dtype=np.int64))
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_bytes": n,
                        "byte_sum": s,
                        "mean_px": float(s) / float(n * 255) if n else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, BYTE_STATS_SCHEMA)


def gif_roundtrip_stats(media: DataFrame) -> DataFrame:
    """raw8 → REAL GIF89a container (identity gray palette, GIF-LZW
    compress, operators/gif.py) → full production decode
    (``_decode_payload`` gif path: sub-block unwrap, LZW decompress,
    palette → integer luma) → exact integer stats of the DECODED
    pixels. GIF is lossless and the gray palette makes luma the
    identity, so the oracle is the plain raw-byte statistics — any
    LZW/palette/framing bug breaks the hash."""
    from jagular_spark.operators.gif import encode_gif_gray8

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(
                        f"codec {r.codec!r}: gif_roundtrip_stats needs raw8 input"
                    )
                h, w = int(r.height), int(r.width)
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)[: h * w]
                if len(buf) < h * w:
                    buf = np.pad(buf, (0, h * w - len(buf)))
                dec01 = _decode_payload(
                    encode_gif_gray8(buf.reshape(h, w)), "gif", h, w
                )
                dec = np.rint(dec01 * np.float64(255.0)).astype(np.int64)
                n = int(dec.size)
                s = int(dec.sum())
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_bytes": n,
                        "byte_sum": s,
                        "mean_px": float(s) / float(n * 255) if n else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, BYTE_STATS_SCHEMA)


def flac_roundtrip_byte_stats(media: DataFrame, window: int = 1024) -> DataFrame:
    """raw8 PCM bytes → int16 samples (byte − 128) → REAL FLAC encode
    (operators/flac.py: fixed predictors + Rice residuals, CRC-8/16) →
    full FLAC decode → the same windowed integer deviation stats the
    raw-byte audio oracle scores. FLAC is lossless, so the oracle is
    exactly :func:`audio_window_byte_stats`'s — any predictor / Rice /
    framing / CRC bug breaks the hash."""
    from jagular_spark.operators.flac import decode_flac, encode_flac_pcm16

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(
                        f"codec {r.codec!r}: flac_roundtrip_byte_stats needs raw8"
                    )
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8).astype(np.int16)
                payload = encode_flac_pcm16(
                    buf - 128, sample_rate=int(r.sample_rate) or 16000
                )
                samples, _sr = decode_flac(payload)
                dev_all = samples.astype(np.int64)
                n_win = len(dev_all) // window
                if n_win == 0:
                    continue
                dev = dev_all[: n_win * window].reshape(n_win, window)
                sum_dev2 = (dev * dev).sum(axis=1)
                peak = np.abs(dev).max(axis=1)
                clipped = (np.abs(dev) >= 127).sum(axis=1)
                for i in range(n_win):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "window_idx": i,
                            "sum_dev2": int(sum_dev2[i]),
                            "peak_dev": int(peak[i]),
                            "n_clipped": int(clipped[i]),
                            "rms": float(np.sqrt(float(sum_dev2[i]) / window) / 128.0),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, AUDIO_WINDOW_BYTE_SCHEMA)


def jpeg_encode_images(media: DataFrame, quality: int = 100) -> DataFrame:
    """Re-encode raw8 grayscale payloads as REAL baseline JPEG
    containers (operators/jpeg.encode_jpeg_gray8) — the media sink half
    of the JPEG round-trip. Same media schema out, codec='jpeg'."""
    from jagular_spark.operators.jpeg import encode_jpeg_gray8

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b.copy()
            payloads = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(f"codec {r.codec!r}: jpeg encode needs raw8 input")
                h, w = int(r.height), int(r.width)
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)[: h * w]
                if len(buf) < h * w:
                    buf = np.pad(buf, (0, h * w - len(buf)))
                payloads.append(encode_jpeg_gray8(buf.reshape(h, w), quality))
            out["payload"] = payloads
            out["codec"] = "jpeg"
            yield out

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


JPEG_ROUNDTRIP_SCHEMA = (
    "media_id long, height int, width int, n_px bigint, orig_sum bigint, "
    "mean_px double, roundtrip_ok boolean"
)


def jpeg_roundtrip_stats(
    media: DataFrame, quality: int = 100, tol: int = 2, progressive: bool = False
) -> DataFrame:
    """raw8 → baseline JPEG → full decode, scored in ONE narrow Arrow
    map: encode each grayscale payload (encode_jpeg_gray8, or the
    SOF2 multi-scan ``encode_jpeg_gray8_progressive`` when
    ``progressive=True``), decode it back through the production
    ``_decode_payload`` jpeg path, and emit
    exact integer stats of the ORIGINAL pixels plus ``roundtrip_ok`` =
    dims survived AND max |decoded − original| ≤ ``tol``.

    JPEG is lossy, so unlike the PNG round-trip the decoded bytes
    cannot hash-match a raw-byte oracle; what IS oracle-exact is the
    original-pixel statistics and the tolerance flag. ``tol`` is
    CORPUS-CALIBRATED, not spec-derived: at quality 100 the Annex-K
    table scales to all-ones and the residual is quantization (±0.5
    per coefficient) + IDCT rounding — empirically ≤ 1 on the shipped
    doc-byte corpora, but adversarial 8x8 blocks can exceed any fixed
    small bound (worst case ~±7), so a flag flip on NEW data is
    data-dependent, not necessarily a Huffman/DCT regression. A codec
    bug on the shipped corpora flips the flag and the driver hash goes
    red; the spec-level decoder checks (hand-built T.81 streams) live
    in tests/test_jpeg.py."""
    from jagular_spark.operators.jpeg import (
        encode_jpeg_gray8,
        encode_jpeg_gray8_progressive,
    )

    enc = encode_jpeg_gray8_progressive if progressive else encode_jpeg_gray8

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(
                        f"codec {r.codec!r}: jpeg_roundtrip_stats needs raw8 input"
                    )
                h, w = int(r.height), int(r.width)
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)[: h * w]
                if len(buf) < h * w:
                    buf = np.pad(buf, (0, h * w - len(buf)))
                orig = buf.reshape(h, w)
                dec01 = _decode_payload(enc(orig, quality), "jpeg", h, w)
                dec = np.rint(dec01 * 255.0).astype(np.int64)
                ok = dec.shape == (h, w) and bool(
                    np.abs(dec - orig.astype(np.int64)).max(initial=0) <= tol
                )
                s = int(orig.sum(dtype=np.int64))
                n = h * w
                rows.append(
                    {
                        "media_id": r.media_id,
                        "height": h,
                        "width": w,
                        "n_px": n,
                        "orig_sum": s,
                        "mean_px": float(s) / float(n * 255) if n else 0.0,
                        "roundtrip_ok": ok,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, JPEG_ROUNDTRIP_SCHEMA)


MJPEG_ROUNDTRIP_SCHEMA = (
    "media_id long, frame_idx long, height int, width int, orig_sum bigint, "
    "mean_px double, frame_ok boolean"
)


def mjpeg_roundtrip_stats(
    media: DataFrame,
    quality: int = 100,
    tol: int = 2,
    frame_h: int = 16,
    frame_w: int = 16,
) -> DataFrame:
    """REAL compressed-VIDEO roundtrip: raw8 bytes become consecutive
    (frame_h, frame_w) grayscale frames, each baseline-JPEG encoded,
    packed into a RIFF/AVI Motion-JPEG container
    (operators/mjpeg.encode_avi_mjpeg), then the container is parsed
    back (header dims/fps/frame-count verified) and every frame decoded
    through the production ``_decode_payload`` jpeg path. Emits one row
    per frame with exact integer stats of the ORIGINAL frame bytes plus
    ``frame_ok`` = container fields survived AND |decoded − original| ≤
    ``tol`` (corpus-calibrated, see jpeg_roundtrip_stats). One narrow
    Arrow map — payloads never shuffle."""
    from jagular_spark.operators.jpeg import encode_jpeg_gray8
    from jagular_spark.operators.mjpeg import decode_avi_mjpeg, encode_avi_mjpeg

    fsz = frame_h * frame_w

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(
                        f"codec {r.codec!r}: mjpeg_roundtrip_stats needs raw8 input"
                    )
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                nf = len(buf) // fsz
                if nf == 0:
                    continue
                origs = [
                    buf[i * fsz : (i + 1) * fsz].reshape(frame_h, frame_w)
                    for i in range(nf)
                ]
                avi = encode_avi_mjpeg(
                    [encode_jpeg_gray8(p, quality) for p in origs],
                    frame_w, frame_h, fps=10,
                )
                payloads, w, h, fps = decode_avi_mjpeg(avi)
                dims_ok = (
                    (w, h, fps) == (frame_w, frame_h, 10) and len(payloads) == nf
                )
                for i, (jp, orig) in enumerate(zip(payloads, origs)):
                    dec01 = _decode_payload(jp, "jpeg", frame_h, frame_w)
                    dec = np.rint(dec01 * 255.0).astype(np.int64)
                    ok = (
                        dims_ok
                        and dec.shape == (frame_h, frame_w)
                        and bool(
                            np.abs(dec - orig.astype(np.int64)).max(initial=0) <= tol
                        )
                    )
                    s = int(orig.sum(dtype=np.int64))
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "height": frame_h,
                            "width": frame_w,
                            "orig_sum": s,
                            "mean_px": float(s) / float(fsz * 255),
                            "frame_ok": ok,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, MJPEG_ROUNDTRIP_SCHEMA)


def mpeg1_roundtrip_stats(
    media: DataFrame,
    qscale: int = 1,
    tol: int = 8,
    frame_h: int = 16,
    frame_w: int = 16,
    flat_quant: int | None = 16,
) -> DataFrame:
    """REAL inter-format VIDEO roundtrip — MPEG-1 (ISO 11172-2)
    I-frame-only elementary stream, not a container of stills: raw8
    bytes become consecutive grayscale frames, ALL frames encode into
    ONE stream (sequence header + GOP + per-frame I pictures, intra DC
    DPCM chains, run-level AC VLCs, §2.4.4.1 dequant with mismatch
    control — operators/mpeg1.py), the stream decodes back and every
    frame is compared. Emits one row per frame with exact integer
    stats of the ORIGINAL frame bytes plus ``frame_ok`` = stream dims/
    frame-count survived AND |decoded − original| ≤ ``tol``
    (corpus-calibrated: quantizer + oddification + IDCT rounding;
    ``flat_quant`` ships a flat custom intra matrix — the
    load_intra_quantizer_matrix path — for a tighter bound than the
    default perceptual matrix). One narrow Arrow map — payloads never
    shuffle. Same output schema as mjpeg_roundtrip_stats."""
    import numpy as _np

    from jagular_spark.operators.mpeg1 import (
        decode_mpeg1_intra,
        encode_mpeg1_intra,
    )

    fsz = frame_h * frame_w
    quant = (
        None
        if flat_quant is None
        else _np.full(64, int(flat_quant), dtype=_np.int64)
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(
                        f"codec {r.codec!r}: mpeg1_roundtrip_stats needs raw8 input"
                    )
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                nf = len(buf) // fsz
                if nf == 0:
                    continue
                origs = [
                    buf[i * fsz : (i + 1) * fsz].reshape(frame_h, frame_w)
                    for i in range(nf)
                ]
                stream = encode_mpeg1_intra(origs, qscale, quant)
                dec_frames, w, h = decode_mpeg1_intra(stream)
                dims_ok = (w, h) == (frame_w, frame_h) and len(dec_frames) == nf
                for i, (dec, orig) in enumerate(zip(dec_frames, origs)):
                    ok = (
                        dims_ok
                        and dec.shape == (frame_h, frame_w)
                        and bool(
                            np.abs(
                                dec.astype(np.int64) - orig.astype(np.int64)
                            ).max(initial=0)
                            <= tol
                        )
                    )
                    s = int(orig.sum(dtype=np.int64))
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "height": frame_h,
                            "width": frame_w,
                            "orig_sum": s,
                            "mean_px": float(s) / float(fsz * 255),
                            "frame_ok": ok,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, MJPEG_ROUNDTRIP_SCHEMA)


def mpeg1_halfpel_roundtrip_stats(
    media: DataFrame,
    qscale: int = 1,
    tol: int = 8,
    frame_h: int = 32,
    frame_w: int = 8,
    intra_period: int = 4,
    b_frames: int = 0,
    flat_quant: int | None = 16,
    max_frames: int = 16,
) -> DataFrame:
    """HALF-PEL motion-compensated roundtrip (r13): frames step by
    HALF a row per display position — even frames are plain row
    windows of the payload at offset t/2 rows, odd frames are the
    §2.4.4.2-rounded average of adjacent rows ((a + b + 1) >> 1), a
    true +0.5-pel vertical shift no full-pel vector can express — and
    the whole sequence encodes with ``half_pel=True``: the two-stage
    search must land on ODD vertical vectors for the half-row steps
    (pinned on this exact geometry in tests/test_mpeg1_halfpel.py::
    test_corpus_geometry_selects_odd_vectors — the r12 vacuity
    discipline: a green row must certify interpolation that RAN), and
    decode == the encoder's closed-loop reconstruction BIT-EXACTLY.
    The oracle reproduces the frame construction — including the odd
    frames' rounded row averages — in exact integer SQL. Same output
    schema / narrow Arrow-map shape as mpeg1_roundtrip_stats; payloads
    never shuffle."""
    import numpy as _np

    from jagular_spark.operators.mpeg1 import _encode_video, decode_mpeg1_video

    quant = (
        None
        if flat_quant is None
        else _np.full(64, int(flat_quant), dtype=_np.int64)
    )
    fsz = frame_h * frame_w

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(
                        f"codec {r.codec!r}: mpeg1_halfpel_roundtrip_stats "
                        "needs raw8 input"
                    )
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                n_rows = len(buf) // frame_w
                if n_rows < frame_h + 2:
                    continue
                grid = (
                    buf[: n_rows * frame_w]
                    .reshape(n_rows, frame_w)
                    .astype(np.int64)
                )
                # max t: even 2(R-h); capped — the half-row stride
                # yields ~2 frames per payload ROW (~70/doc), and 16
                # already exercises 8 odd half-pel steps per stream
                nf = min(2 * n_rows - (2 * frame_h - 1), max_frames)
                origs = []
                for t in range(nf):
                    off = t // 2
                    if t % 2 == 0:
                        f = grid[off : off + frame_h]
                    else:
                        f = (
                            grid[off : off + frame_h]
                            + grid[off + 1 : off + frame_h + 1]
                            + 1
                        ) >> 1
                    origs.append(f.astype(np.uint8))
                # one encoder pass yields BOTH the stream and the
                # closed-loop reconstruction (the two public wrappers
                # each re-run the encode — 2x the work for nothing)
                stream, expected = _encode_video(
                    origs, qscale, intra_period, 7, quant, b_frames, True
                )
                dec_frames, w, h = decode_mpeg1_video(stream)
                dims_ok = (w, h) == (frame_w, frame_h) and len(dec_frames) == nf
                for i, (dec, exp, orig) in enumerate(
                    zip(dec_frames, expected, origs)
                ):
                    ok = (
                        dims_ok
                        and dec.shape == (frame_h, frame_w)
                        and np.array_equal(dec, exp)
                        and bool(
                            np.abs(
                                dec.astype(np.int64) - orig.astype(np.int64)
                            ).max(initial=0)
                            <= tol
                        )
                    )
                    s = int(orig.sum(dtype=np.int64))
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "height": frame_h,
                            "width": frame_w,
                            "orig_sum": s,
                            "mean_px": float(s) / float(fsz * 255),
                            "frame_ok": ok,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, MJPEG_ROUNDTRIP_SCHEMA)


def mpeg1_pframe_roundtrip_stats(
    media: DataFrame,
    qscale: int = 1,
    tol: int = 8,
    frame_h: int = 32,
    frame_w: int = 8,
    stride_rows: int = 8,
    intra_period: int = 4,
    flat_quant: int | None = 16,
    b_frames: int = 0,
) -> DataFrame:
    """MOTION-COMPENSATED video roundtrip — MPEG-1 I+P elementary
    stream (operators/mpeg1.py encode_mpeg1_video): frames are cut
    from the payload at a ``stride_rows``-row overlap stride, so frame
    t+1 is frame t shifted up by that many rows — genuine vertical
    motion the exhaustive even full-pel search must find (dy = 8 sits
    inside the ±8 window), making P pictures predict rather than fall
    back to intra on corpus bytes. The frame must be TALLER than one
    macroblock for this to be real: a 16-row frame pads to a 16-row
    plane where the only in-bounds vector is (0, 0) — with 32 rows
    (2 MB rows) the top macroblock's +8 match lies inside the
    reference plane and genuinely motion-compensates, while the bottom
    one (whose match would extend past the plane) takes the residual/
    intra path, exercising both. The default 8-column width keeps the
    frame at 256 B so real corpus docs (max ~550 ASCII bytes) yield
    MULTI-frame streams — i.e. actual P pictures — while the width
    pads to the 16 grid edge-replicated, identically in every frame,
    so prediction stays aligned. ``frame_ok`` = stream dims/frame
    count survived AND decode == the encoder's closed-loop internal
    reconstruction BIT-EXACTLY (the audio-codec discipline — drift
    would compound frame over frame and fail at the first P picture)
    AND |decoded − original| ≤ ``tol``. Same output schema / narrow
    Arrow-map shape as mpeg1_roundtrip_stats; payloads never
    shuffle.

    ``b_frames`` > 0 (r13) inserts BIDIRECTIONAL pictures between
    anchors: with the same shifted-window geometry the B picture's TOP
    macroblock can only be predicted FORWARD (its match in the past
    anchor sits at dy=+8, in-plane; the future anchor's match would be
    above the plane) while the BOTTOM macroblock can only be predicted
    BACKWARD (mirror argument), so every B picture provably exercises
    both prediction directions — not a geometry where one mode
    silently wins everywhere (the r12 vacuity lesson, pinned in
    tests/test_mpeg1_bframes.py::test_corpus_geometry_forces_both_directions)."""
    import numpy as _np

    from jagular_spark.operators.mpeg1 import _encode_video, decode_mpeg1_video

    fsz = frame_h * frame_w
    stride = stride_rows * frame_w
    quant = (
        None
        if flat_quant is None
        else _np.full(64, int(flat_quant), dtype=_np.int64)
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(
                        f"codec {r.codec!r}: mpeg1_pframe_roundtrip_stats "
                        "needs raw8 input"
                    )
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                if len(buf) < fsz:
                    continue
                nf = (len(buf) - fsz) // stride + 1
                origs = [
                    buf[i * stride : i * stride + fsz].reshape(frame_h, frame_w)
                    for i in range(nf)
                ]
                # single encoder pass for stream + closed-loop recon
                stream, expected = _encode_video(
                    origs, qscale, intra_period, 8, quant, b_frames
                )
                dec_frames, w, h = decode_mpeg1_video(stream)
                dims_ok = (w, h) == (frame_w, frame_h) and len(dec_frames) == nf
                for i, (dec, exp, orig) in enumerate(
                    zip(dec_frames, expected, origs)
                ):
                    ok = (
                        dims_ok
                        and dec.shape == (frame_h, frame_w)
                        and np.array_equal(dec, exp)
                        and bool(
                            np.abs(
                                dec.astype(np.int64) - orig.astype(np.int64)
                            ).max(initial=0)
                            <= tol
                        )
                    )
                    s = int(orig.sum(dtype=np.int64))
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "height": frame_h,
                            "width": frame_w,
                            "orig_sum": s,
                            "mean_px": float(s) / float(fsz * 255),
                            "frame_ok": ok,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, MJPEG_ROUNDTRIP_SCHEMA)


JPEG_COLOR_ROUNDTRIP_SCHEMA = (
    "media_id long, height int, width int, n_bytes long, orig_sum long, "
    "mean_byte double, y_ok boolean, chroma_ok boolean"
)

MPEG1_COLOR_SCHEMA = (
    "media_id long, frame_idx long, height int, width int, orig_sum long, "
    "mean_px double, y_ok boolean, chroma_ok boolean"
)


def mpeg1_color_roundtrip_stats(
    media: DataFrame,
    qscale: int = 1,
    tol: int = 8,
    frame_h: int = 16,
    frame_w: int = 16,
    flat_quant: int | None = 16,
) -> DataFrame:
    """COLOR MPEG-1 intra video roundtrip: raw8 bytes become
    consecutive (frame_h, frame_w, 3) RGB frames, ALL frames encode
    into ONE 4:2:0 I-frame-only elementary stream with genuinely-coded
    chroma (operators/mpeg1.encode_mpeg1_intra_color), the stream
    decodes back to (Y, Cb, Cr) planes, and per frame two flags are
    verified: ``y_ok`` (decoded luma within ``tol`` of the JFIF Y of
    the input) and ``chroma_ok`` (decoded half-res Cb/Cr within
    ``tol`` of the encoder-side box-averaged reference) — the chroma
    DC DPCM chains and chroma AC paths carry real data end to end.
    One narrow Arrow map; payloads never shuffle."""
    import numpy as _np

    from jagular_spark.operators.jpeg import rgb_to_ycbcr
    from jagular_spark.operators.mpeg1 import (
        decode_mpeg1_intra_color,
        encode_mpeg1_intra_color,
    )

    fsz = frame_h * frame_w * 3
    quant = (
        None
        if flat_quant is None
        else _np.full(64, int(flat_quant), dtype=_np.int64)
    )
    ph, pw = (frame_h + 15) // 16 * 16, (frame_w + 15) // 16 * 16
    ch, cw = (frame_h + 1) // 2, (frame_w + 1) // 2

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(
                        f"codec {r.codec!r}: mpeg1_color_roundtrip_stats needs raw8"
                    )
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                nf = len(buf) // fsz
                if nf == 0:
                    continue
                origs = [
                    buf[i * fsz : (i + 1) * fsz].reshape(frame_h, frame_w, 3)
                    for i in range(nf)
                ]
                stream = encode_mpeg1_intra_color(origs, qscale, quant)
                dec, w, h = decode_mpeg1_intra_color(stream)
                dims_ok = (w, h) == (frame_w, frame_h) and len(dec) == nf
                for i, (planes, rgb) in enumerate(zip(dec, origs)):
                    y, cb, cr = rgb_to_ycbcr(rgb)
                    pad = lambda p: np.pad(  # noqa: E731
                        p.astype(np.float64),
                        ((0, ph - frame_h), (0, pw - frame_w)),
                        mode="edge",
                    )
                    down = lambda p: np.rint(  # noqa: E731
                        pad(p).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                    )
                    y_ok = bool(
                        dims_ok
                        and np.abs(
                            planes[0].astype(np.int64) - y.astype(np.int64)
                        ).max(initial=0)
                        <= tol
                    )
                    chroma_ok = bool(
                        dims_ok
                        and np.abs(
                            planes[1].astype(np.float64) - down(cb)[:ch, :cw]
                        ).max(initial=0)
                        <= tol
                        and np.abs(
                            planes[2].astype(np.float64) - down(cr)[:ch, :cw]
                        ).max(initial=0)
                        <= tol
                    )
                    frame_bytes = buf[i * fsz : (i + 1) * fsz]
                    s = int(frame_bytes.sum(dtype=np.int64))
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "height": frame_h,
                            "width": frame_w,
                            "orig_sum": s,
                            "mean_px": float(s) / float(fsz * 255),
                            "y_ok": y_ok,
                            "chroma_ok": chroma_ok,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, MPEG1_COLOR_SCHEMA)


def jpeg_color_roundtrip_stats(
    media: DataFrame, quality: int = 100, tol: int = 2
) -> DataFrame:
    """raw8 bytes reshaped to (h, w, 3) RGB → 4:2:0 color JPEG encode
    (operators/jpeg.encode_jpeg_color420) → full production decode →
    exact integer stats of the ORIGINAL bytes plus two roundtrip
    flags: ``y_ok`` (luma plane within ``tol`` of the JFIF Y of the
    input) and ``chroma_ok`` (decoded Cb/Cr, sampled at the 2x2 grid
    corners the nearest-neighbor upsample replicates, within ``tol``
    of the encoder-side box-averaged chroma). Exercises the chroma MCU
    schedule, the K.2/K.4/K.6 chroma tables and both DC predictor
    chains end to end. ``tol`` is corpus-calibrated (see
    jpeg_roundtrip_stats); media rows carry width as the RGB width and
    height rows of w*3 bytes each."""
    from jagular_spark.operators.jpeg import (
        _pad_replicate,
        encode_jpeg_color420,
        rgb_to_ycbcr,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(
                        f"codec {r.codec!r}: jpeg_color_roundtrip_stats needs raw8"
                    )
                h, w = int(r.height), int(r.width)
                need = h * w * 3
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)[:need]
                if len(buf) < need or h == 0:
                    continue
                rgb = buf.reshape(h, w, 3)
                planes, dh, dw = _jpeg_decode_planes(
                    encode_jpeg_color420(rgb, quality)
                )
                y, cb, cr = rgb_to_ycbcr(rgb)
                ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
                down = lambda p: np.rint(  # noqa: E731
                    _pad_replicate(p, ph, pw)
                    .reshape(ph // 2, 2, pw // 2, 2)
                    .mean(axis=(1, 3))
                )
                ch, cw = (h + 1) // 2, (w + 1) // 2
                y_ok = (
                    (dh, dw) == (h, w)
                    and len(planes) == 3
                    and np.abs(
                        planes[0].astype(np.int64) - y.astype(np.int64)
                    ).max(initial=0)
                    <= tol
                )
                chroma_ok = bool(
                    len(planes) == 3
                    and np.abs(
                        planes[1][0::2, 0::2].astype(np.float64)[:ch, :cw]
                        - down(cb)[:ch, :cw]
                    ).max(initial=0)
                    <= tol
                    and np.abs(
                        planes[2][0::2, 0::2].astype(np.float64)[:ch, :cw]
                        - down(cr)[:ch, :cw]
                    ).max(initial=0)
                    <= tol
                )
                s = int(buf.sum(dtype=np.int64))
                rows.append(
                    {
                        "media_id": r.media_id,
                        "height": h,
                        "width": w,
                        "n_bytes": need,
                        "orig_sum": s,
                        "mean_byte": float(s) / float(need),
                        "y_ok": bool(y_ok),
                        "chroma_ok": chroma_ok,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, JPEG_COLOR_ROUNDTRIP_SCHEMA)


def _jpeg_decode_planes(payload: bytes):
    from jagular_spark.operators.jpeg import decode_jpeg

    return decode_jpeg(payload)


def wav_encode_audio(media: DataFrame) -> DataFrame:
    """Re-encode raw8 PCM-byte payloads as REAL mono PCM16 RIFF/WAVE
    containers with samples = byte − 128 (the same deviation the byte
    oracle scores) — the audio sink half of the wav round-trip."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b.copy()
            payloads = []
            for r in b.itertuples(index=False):
                if r.codec != "raw8":
                    raise NotImplementedError(f"codec {r.codec!r}: wav encode needs raw8 input")
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8).astype(np.int16)
                payloads.append(
                    encode_wav_pcm16(buf - 128, sample_rate=int(r.sample_rate) or 16000)
                )
            out["payload"] = payloads
            out["codec"] = "wav"
            yield out

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def wav_window_byte_stats(media: DataFrame, window: int = 1024) -> DataFrame:
    """:func:`audio_window_byte_stats` for REAL wav containers: decode
    through :func:`decode_wav_pcm16`, deviations are the samples
    themselves — so a byte−128 wav round-trip is verifiable against the
    raw-byte audio oracle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                if r.codec != "wav":
                    raise NotImplementedError(f"codec {r.codec!r}: wav_window_byte_stats needs wav")
                samples, _sr = decode_wav_pcm16(bytes(r.payload))
                dev_all = samples.astype(np.int64)
                n_win = len(dev_all) // window
                if n_win == 0:
                    continue
                dev = dev_all[: n_win * window].reshape(n_win, window)
                sum_dev2 = (dev * dev).sum(axis=1)
                peak = np.abs(dev).max(axis=1)
                clipped = (np.abs(dev) >= 127).sum(axis=1)
                for i in range(n_win):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "window_idx": i,
                            "sum_dev2": int(sum_dev2[i]),
                            "peak_dev": int(peak[i]),
                            "n_clipped": int(clipped[i]),
                            "rms": float(np.sqrt(float(sum_dev2[i]) / window) / 128.0),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "audio").mapInPandas(kernel, AUDIO_WINDOW_BYTE_SCHEMA)
