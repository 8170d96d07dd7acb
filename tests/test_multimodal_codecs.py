"""Real codec-free media decoding (operators/multimodal.py): PCM WAV and
P6 PPM implemented from their public specs — decode correctness against
analytically-known signals, and the decode_stub=False Spark path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from skripsi_mapreduce_spark.operators.multimodal import (
    _audio_features_real,
    _decode_ppm,
    _decode_wav,
    _image_features_real,
    _split_ppm_sequence,
    extract_audio_features,
    extract_image_features,
    make_ppm,
    make_ppm_video,
    make_wav,
    sample_frames,
    synthetic_codec_media,
)


def test_wav_roundtrip_and_sine_rms():
    rate, amp, n = 8000, 16000, 8000  # 1 s of a 440 Hz sine
    samples = [int(amp * math.sin(2 * math.pi * 440 * t / rate)) for t in range(n)]
    blob = make_wav(samples, rate)
    got_rate, got = _decode_wav(blob)
    assert got_rate == rate and list(got) == samples
    dur_ms, sr, rms, bands = _audio_features_real(blob)
    assert dur_ms == 1000 and sr == rate
    # sine RMS = A / sqrt(2); quantization + int truncation allow ~1% slack
    assert abs(rms - (amp / 32768.0) / math.sqrt(2)) < 0.01
    assert len(bands) == 8 and all(abs(b - rms) < 0.02 for b in bands)


def test_wav_stereo_downmix_and_extra_chunks():
    import numpy as np

    # interleaved stereo: L = 1000, R = 3000 -> mono mean 2000
    inter = np.array([1000, 3000] * 100, dtype="<i2")
    pcm = inter.tobytes()
    import struct

    hdr = struct.pack(
        "<4sI4s4sIHHIIHH",
        b"RIFF", 4 + 8 + 16 + 8 + 10 + 8 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 2, 8000, 8000 * 4, 4, 16,
    )
    junk = struct.pack("<4sI", b"LIST", 10) + b"\x00" * 10
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    rate, mono = _decode_wav(hdr + junk + data)
    assert rate == 8000 and set(mono.tolist()) == {2000}


def test_ppm_roundtrip_solid_color_luma():
    w, h, color = 10, 4, (200, 100, 50)
    blob = make_ppm(w, h, bytes(color) * (w * h))
    gw, gh, px = _decode_ppm(blob)
    assert (gw, gh) == (w, h) and tuple(px[0, 0]) == color
    width, height, luma, feat = _image_features_real(blob)
    want_luma = (0.299 * 200 + 0.587 * 100 + 0.114 * 50) / 255.0
    assert (width, height) == (w, h)
    assert abs(luma - want_luma) < 1e-9
    assert abs(feat[0] - 200 / 255) < 1e-9 and abs(feat[3]) < 1e-9  # zero std
    assert all(abs(q - want_luma) < 1e-9 for q in feat[4:8])


def test_ppm_header_comments_supported():
    blob = b"P6\n# a comment\n2 1\n# another\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    w, h, px = _decode_ppm(blob)
    assert (w, h) == (2, 1) and tuple(px[0, 1]) == (4, 5, 6)


def test_compressed_formats_raise_named_error():
    with pytest.raises(NotImplementedError, match="PIL|opencv"):
        _image_features_real(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        _decode_wav(b"ID3....mp3-ish")


def test_spark_real_decode_path(spark):
    media = synthetic_codec_media(spark, n=8)
    audio = {r["media_id"]: r for r in
             extract_audio_features(media, decode_stub=False).collect()}
    image = {r["media_id"]: r for r in
             extract_image_features(media, decode_stub=False).collect()}
    assert len(audio) == 4 and len(image) == 2
    for r in audio.values():
        assert r["sample_rate"] == 8000 and r["duration_ms"] == 250
        assert 0.1 < r["rms"] < 0.9 and len(r["feature"]) == 8
    for r in image.values():
        # real decoded dimensions equal the metadata the fixture wrote
        assert r["width"] is not None and r["width"] >= 9
        assert 0.0 <= r["mean_luma"] <= 1.0 and len(r["feature"]) == 8


def test_ppm_sequence_split_and_rejects():
    frames = [make_ppm(2, 2, bytes((i, 0, 0)) * 4) for i in range(5)]
    blob = make_ppm_video(frames)
    assert _split_ppm_sequence(blob) == frames
    with pytest.raises(NotImplementedError, match="pyav|ffmpeg"):
        _split_ppm_sequence(b"\x00\x00\x00\x20ftypisom....")  # mp4-ish
    with pytest.raises(ValueError):
        _split_ppm_sequence(blob[:-3])  # truncated raster


def test_spark_real_frame_sampling(spark):
    """PPM-sequence videos sample real frames: each sampled frame is a
    standalone P6 blob decodable by the image path."""
    media = synthetic_codec_media(spark, n=8)  # ids 3 and 7 are videos
    got = sample_frames(media, every_n=2, max_frames=3, decode_stub=False).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {3, 7}
    for rows in by_id.values():
        # 6 frames, every 2nd, capped at 3 -> indices 0, 2, 4
        assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4]
        for r in rows:
            fb = bytes(r["frame_bytes"])
            assert fb[:2] == b"P6"
            w, h, lum, feat = _image_features_real(fb)
            assert (w, h) == (4, 3) and len(feat) == 8
