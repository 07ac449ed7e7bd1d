"""Multimodal plumbing tests: real Arrow/mapInPandas machinery with the
raw8 codec; compressed codecs must raise the documented stub error."""

from __future__ import annotations

import numpy as np
import pytest

from jagular_spark.operators import multimodal as mm


def test_decode_image_features_matches_numpy(spark):
    media = mm.synthesize_media(spark)
    out = {r.media_id: r for r in mm.decode_image_features(media).collect()}
    src = {r.media_id: r for r in media.where("kind = 'image'").collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        s = src[mid]
        img = np.frombuffer(bytes(s.payload), dtype=np.uint8).reshape(s.height, s.width) / 255.0
        assert (r.height, r.width) == img.shape
        assert r.mean == pytest.approx(img.mean(), abs=1e-12)
        assert r.std == pytest.approx(img.std(), abs=1e-12)


def test_resize_roundtrip_schema_and_shape(spark):
    media = mm.synthesize_media(spark)
    out = mm.resize_image(media, 12, 10)
    rows = out.collect()
    assert out.schema.simpleString() == media.schema.simpleString()
    for r in rows:
        assert (r.height, r.width) == (12, 10)
        assert len(bytes(r.payload)) == 120
    # resized output is itself decodable by the same pipeline
    feats = mm.decode_image_features(out).collect()
    assert len(feats) == len(rows)


def test_video_frame_sampling_counts(spark):
    media = mm.synthesize_media(spark)
    out = mm.sample_video_frames(media, every_k=10).collect()
    vids = media.where("kind = 'video'").collect()
    expect = sum(len(range(0, v.n_frames, 10)) for v in vids)
    assert len(out) == expect
    assert all(r.frame_idx % 10 == 0 for r in out)


def test_audio_windows_vectorized(spark):
    media = mm.synthesize_media(spark)
    out = mm.audio_window_features(media, window=1024).collect()
    auds = media.where("kind = 'audio'").collect()
    assert len(out) == sum(len(bytes(a.payload)) // 1024 for a in auds)
    assert all(0.0 <= r.rms <= 1.0 and r.peak <= 1.0 for r in out)


def test_partitioning_invariance(spark):
    media = mm.synthesize_media(spark)
    a = sorted(map(tuple, mm.decode_image_features(media).collect()))
    b = sorted(map(tuple, mm.decode_image_features(media.repartition(7)).collect()))
    assert a == b


def test_compressed_codec_raises_stub_error():
    with pytest.raises(NotImplementedError, match="raw8"):
        mm._decode_payload(b"\xff\xd8\xff", "jpeg", 4, 4)


def test_video_frame_byte_stats_matches_numpy(spark):
    import numpy as np

    from jagular_spark.operators.multimodal import synthesize_media, video_frame_byte_stats

    media = synthesize_media(spark)
    got = {
        (r.media_id, r.frame_idx): (r.n_bytes, r.byte_sum, r.mean_px)
        for r in video_frame_byte_stats(media, every_k=4).collect()
    }
    vids = media.where("kind = 'video'").collect()
    want = {}
    for r in vids:
        fl = r.height * r.width
        buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
        n_full = min(r.n_frames, len(buf) // fl)
        for fi in range(0, n_full, 4):
            s = int(buf[fi * fl : (fi + 1) * fl].sum(dtype=np.int64))
            want[(r.media_id, fi)] = (fl, s, s / (fl * 255))
    assert got == want and len(got) > 0


def test_audio_window_byte_stats_matches_numpy(spark):
    import numpy as np

    from jagular_spark.operators.multimodal import audio_window_byte_stats, synthesize_media

    media = synthesize_media(spark)
    W = 64
    got = {
        (r.media_id, r.window_idx): (r.sum_dev2, r.peak_dev, r.n_clipped, r.rms)
        for r in audio_window_byte_stats(media, window=W).collect()
    }
    want = {}
    for r in media.where("kind = 'audio'").collect():
        buf = np.frombuffer(bytes(r.payload), dtype=np.uint8).astype(np.int64)
        for i in range(len(buf) // W):
            dev = buf[i * W : (i + 1) * W] - 128
            s = int((dev * dev).sum())
            want[(r.media_id, i)] = (
                s,
                int(np.abs(dev).max()),
                int((np.abs(dev) >= 127).sum()),
                float(np.sqrt(s / W) / 128.0),
            )
    assert got == want and len(got) > 0


def test_resize_pixel_grid_matches_resized_payload(spark):
    """The per-pixel grid must be exactly the bytes resize_image encodes
    (same index mapping; float decode round-trips uint8 bit-exactly)."""
    import numpy as np

    from jagular_spark.operators.multimodal import resize_image, resize_pixel_grid, synthesize_media

    media = synthesize_media(spark)
    oh, ow = 5, 7
    grid = {
        (r.media_id, r.r, r.c): r.px for r in resize_pixel_grid(media, oh, ow).collect()
    }
    for r in resize_image(media, oh, ow).collect():
        buf = np.frombuffer(bytes(r.payload), dtype=np.uint8).reshape(oh, ow)
        for ri in range(oh):
            for ci in range(ow):
                assert grid[(r.media_id, ri, ci)] == int(buf[ri, ci])
    assert len(grid) > 0
