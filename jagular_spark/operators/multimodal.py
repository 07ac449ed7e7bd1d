"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` payloads + typed metadata, processed with
Arrow-batched ``mapInPandas`` kernels.

The Spark-side machinery — schemas, batch iteration, vectorized numpy
decode, partition-invariant results — is real and tested. Actual
compressed-codec decoding (JPEG/PNG/opus/h264) is STUBBED: the container
has no image/audio libraries, so only the ``raw8`` codec (raw uint8
grayscale / PCM bytes) is implemented, and any other codec raises
``NotImplementedError`` with a clear message. Swapping in a real decoder
touches exactly one function (`_decode_payload`) — the distributed plan
is unchanged.

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


def _decode_payload(payload: bytes, codec: str, height: int, width: int) -> np.ndarray:
    """Decode one payload to a (height, width) float array in [0, 1].

    ``raw8``: raw uint8 row-major grayscale — genuinely decoded.
    Anything else (jpeg/png/...) requires an image library that is not
    available in this environment — STUB, raises NotImplementedError.
    """
    if codec == "raw8":
        need = height * width
        buf = np.frombuffer(payload, dtype=np.uint8)
        if len(buf) < need:
            buf = np.pad(buf, (0, need - len(buf)))
        return (buf[:need].reshape(height, width) / np.float64(255.0))
    raise NotImplementedError(
        f"codec {codec!r}: compressed-media decoding needs an external decoder "
        "(PIL/ffmpeg), unavailable in this environment; only 'raw8' is implemented"
    )


def decode_image_features(media: DataFrame) -> DataFrame:
    """Image decode + per-image feature extraction: mean/std/p99 of the
    decoded pixel array. One Arrow-batched pass, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                img = _decode_payload(bytes(r.payload), r.codec, r.height, r.width)
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


def resize_image(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize to (out_h, out_w), re-encoded as raw8
    bytes — shape-preserving plumbing for a real resample kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                img = _decode_payload(bytes(r.payload), r.codec, r.height, r.width)
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
    """Windowed audio features over raw8 PCM bytes: RMS, peak, clipped
    count per window — vectorized reshape per batch, no per-sample loop."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8).astype(np.float64)
                n_win = len(buf) // window
                if n_win == 0:
                    continue
                w = buf[: n_win * window].reshape(n_win, window)
                centered = (w - 128.0) / 128.0
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
