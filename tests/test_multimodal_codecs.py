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
    # round 10: JPEG decodes for real (operators/jpeg.py), so jpeg-ish
    # garbage is now a PARSE error like a truncated PNG; webp stays
    # honestly gated with the library named
    with pytest.raises(OSError):
        _image_features_real(b"\xff\xd8\xff\xe0....jpeg-ish")
    with pytest.raises(NotImplementedError, match="PIL|opencv|webp"):
        _image_features_real(b"RIFFxxxxWEBPVP8 ....webp-ish")
    with pytest.raises((ValueError, OSError)):
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


def _png_with_filters(w, h, channels, ctype, pixels, filters):
    """Assemble a PNG whose rows use the given filter types, applying the
    FORWARD filter transform to known pixel bytes (spec, ch. Filtering)."""
    import struct as _struct
    import zlib

    from skripsi_mapreduce_spark.operators.multimodal import PNG_SIG

    stride = w * channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = pixels[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        raw.append(f)
        for i in range(stride):
            a = row[i - channels] if i >= channels else 0
            up = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 0:
                v = row[i]
            elif f == 1:
                v = (row[i] - a) & 0xFF
            elif f == 2:
                v = (row[i] - up) & 0xFF
            elif f == 3:
                v = (row[i] - ((a + up) >> 1)) & 0xFF
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                v = (row[i] - pred) & 0xFF
            raw.append(v)
        prev = row

    def chunk(t, d):
        return (len(d).to_bytes(4, "big") + t + d
                + (zlib.crc32(t + d) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_roundtrip_and_all_filters():
    import random

    from skripsi_mapreduce_spark.operators.multimodal import _decode_png, make_png

    rng = random.Random(5)
    w, h = 9, 7
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    # encoder (filter 0) round-trip
    got_w, got_h, px = _decode_png(make_png(w, h, rgb))
    assert (got_w, got_h) == (w, h) and px.tobytes() == rgb
    # every filter type reconstructs the same pixels
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        blob = _png_with_filters(w, h, 3, 2, rgb, filters)
        assert _decode_png(blob)[2].tobytes() == rgb, f"filters={filters}"


def test_png_grey_and_alpha_variants():
    import random

    from skripsi_mapreduce_spark.operators.multimodal import _decode_png

    rng = random.Random(6)
    w, h = 5, 4
    grey = bytes(rng.randrange(256) for _ in range(w * h))
    _, _, px = _decode_png(_png_with_filters(w, h, 1, 0, grey, [0]))
    assert px.shape == (h, w, 3) and bytes(px[:, :, 0].tobytes()) == grey
    rgba = bytes(rng.randrange(256) for _ in range(w * h * 4))
    _, _, px = _decode_png(_png_with_filters(w, h, 4, 6, rgba, [2]))
    assert px.shape == (h, w, 3)
    assert px.tobytes() == b"".join(rgba[i : i + 3] for i in range(0, len(rgba), 4))


def test_png_rejects_unsupported_and_corrupt():
    import pytest as _pytest

    from skripsi_mapreduce_spark.operators.multimodal import (
        _decode_png,
        _image_features_real,
        make_png,
    )

    blob = make_png(4, 3, bytes(36))
    bad = bytearray(blob)
    bad[20] ^= 0xFF  # corrupt IHDR payload -> CRC mismatch
    with _pytest.raises(OSError, match="CRC"):
        _decode_png(bytes(bad))
    with _pytest.raises(NotImplementedError, match="webp"):
        _image_features_real(b"RIFFxxxxWEBPVP8 ....webp-ish")
    # palette PNG (colortype 3) is honestly gated
    pal = _png_with_filters(2, 2, 1, 3, bytes(4), [0])
    with _pytest.raises(NotImplementedError, match="colortype=3"):
        _decode_png(pal)


def test_png_features_through_spark(spark):
    """The synthetic fixture now carries a real PNG; decode_stub=False
    must produce its true dimensions and luma."""
    from skripsi_mapreduce_spark.operators.multimodal import (
        extract_image_features,
        synthetic_codec_media,
    )

    media = synthetic_codec_media(spark, n=8)
    image = {r["media_id"]: r for r in
             extract_image_features(media, decode_stub=False).collect()}
    assert set(image) == {1, 5}
    for mid in (1, 5):
        r = image[mid]
        assert (r["width"], r["height"]) == (8 + mid, 6 + mid)
        assert 0.0 <= r["mean_luma"] <= 1.0 and len(r["feature"]) == 8


def test_resize_images_nearest_neighbor_exact(spark):
    """Up- and down-sample against a numpy reference: NN index map is
    sx = ox*w//out_w, the output is a valid P6 blob, and every pixel
    matches the gathered source raster byte-for-byte."""
    import numpy as np

    from skripsi_mapreduce_spark.operators.multimodal import (
        _decode_ppm,
        make_ppm,
        resize_images,
    )

    rng = np.random.RandomState(5)
    w, h = 6, 4
    rasters = {i: rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8) for i in range(4)}
    rows = [
        (i, "image", bytearray(make_ppm(w, h, r.tobytes())), None)
        for i, r in rasters.items()
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int,sample_rate:int>",
    )
    for ow, oh in ((12, 8), (3, 2), (6, 4)):
        out = {r["media_id"]: r for r in resize_images(media, ow, oh).collect()}
        sx = (np.arange(ow) * w) // ow
        sy = (np.arange(oh) * h) // oh
        for i, src in rasters.items():
            r = out[i]
            assert (r["width"], r["height"]) == (ow, oh)
            rw, rh, got = _decode_ppm(bytes(r["content"]))
            assert (rw, rh) == (ow, oh)
            expect = src[sy][:, sx]
            assert np.array_equal(got, expect), (i, ow, oh)


def test_resize_images_mixed_ppm_png_table(spark):
    """Magic-byte dispatch: a media table mixing P6 PPM and PNG blobs
    resizes every row, each re-encoded in ITS OWN container — PNG in →
    PNG out (decodable by _decode_png), PPM in → PPM out — with pixels
    matching the NN gather of the source raster byte-for-byte."""
    import numpy as np

    from skripsi_mapreduce_spark.operators.multimodal import (
        PNG_SIG,
        _decode_png,
        _decode_ppm,
        make_png,
        make_ppm,
        resize_images,
    )

    rng = np.random.RandomState(7)
    w, h = 6, 4
    rasters = {i: rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8) for i in range(4)}
    rows = [
        (
            i,
            "image",
            bytearray(
                (make_png if i % 2 else make_ppm)(w, h, r.tobytes())
            ),
            None,
        )
        for i, r in rasters.items()
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int,sample_rate:int>",
    )
    ow, oh = 3, 2
    out = {r["media_id"]: r for r in resize_images(media, ow, oh).collect()}
    sx = (np.arange(ow) * w) // ow
    sy = (np.arange(oh) * h) // oh
    assert set(out) == set(rasters)
    for i, src in rasters.items():
        blob = bytes(out[i]["content"])
        if i % 2:
            assert blob[:8] == PNG_SIG
            rw, rh, got = _decode_png(blob)
        else:
            assert blob[:2] == b"P6"
            rw, rh, got = _decode_ppm(blob)
        assert (rw, rh) == (ow, oh)
        assert np.array_equal(got, src[sy][:, sx]), i


def test_image_dhash_known_raster_and_png_parity(spark):
    """dHash bits computed by hand for a 9x8 raster with one known
    luma step per row, and PPM vs PNG containers of the SAME raster
    must hash identically (the signature is a property of pixels, not
    of the encoding)."""
    import numpy as np

    from skripsi_mapreduce_spark.operators.multimodal import (
        image_dhash,
        make_png,
        make_ppm,
    )

    # row y: pixels 0..y are white (luma high), rest black -> bit set
    # exactly at x == y for y in 0..7 (luma(y) > luma(y+1)), bit y*8+y
    px = np.zeros((8, 9, 3), dtype=np.uint8)
    for y in range(8):
        px[y, : y + 1, :] = 255
    raw = px.tobytes()
    rows = [
        (0, "image", make_ppm(9, 8, raw), None),
        (1, "image", make_png(9, 8, raw), None),
    ]
    media = spark.createDataFrame(rows, schema="media_id long, kind string, content binary, meta string")
    got = {r["media_id"]: (r["sim_hi"], r["sim_lo"]) for r in image_dhash(media).collect()}
    want_bits = {y * 8 + y for y in range(8)}
    lo = sum(1 << b for b in want_bits if b < 32)
    hi = sum(1 << (b - 32) for b in want_bits if b >= 32)
    assert got[0] == (hi, lo)
    assert got[1] == got[0]  # PNG container parity


def test_image_near_dups_blocked_equals_all_pairs(spark):
    """The pigeonhole-blocked image near-dup join must be row-identical
    to the O(n^2) all-pairs verify on the same dHash signatures —
    losslessness of the blocking, on media with planted exact and
    perturbed twins."""
    import numpy as np

    from skripsi_mapreduce_spark.operators.dedup import simhash_near_dups
    from skripsi_mapreduce_spark.operators.multimodal import image_dhash, make_ppm

    rng = np.random.RandomState(11)
    rows = []
    base_px = None
    for i in range(40):
        if i % 10 == 9 and base_px is not None:
            px = base_px.copy()
            if i % 20 == 19:  # perturbed twin
                px[0, 0, :2] = (px[0, 0, :2].astype(int) + 128) % 256
        else:
            px = rng.randint(0, 256, size=(8, 9, 3)).astype(np.uint8)
        base_px = px
        rows.append((i, "image", make_ppm(9, 8, px.tobytes()), None))
    media = spark.createDataFrame(
        rows, schema="media_id long, kind string, content binary, meta string"
    )
    sig = image_dhash(media).withColumnRenamed("media_id", "doc_id").localCheckpoint()
    blocked = sorted(map(tuple, simhash_near_dups(sig, max_hamming=4).collect()))
    allp = sorted(map(tuple, simhash_near_dups(sig, max_hamming=4, block=False).collect()))
    assert blocked == allp
    planted = {(i - 1, i) for i in range(40) if i % 10 == 9}
    got_pairs = {(a, b) for a, b, _ in blocked}
    assert planted <= got_pairs  # every twin found (<=2 bits can move)
    ham = {(a, b): h for a, b, h in blocked}
    assert all(ham[(i - 1, i)] == 0 for i in range(40) if i % 20 == 9)


def test_audio_fingerprint_known_energies_and_blocking(spark):
    """audio_fingerprint bits computed by hand for a known staircase
    energy profile, and the blocked near-dup join must equal the
    all-pairs verify on media with planted exact and perturbed twins."""
    import numpy as np

    from skripsi_mapreduce_spark.operators.dedup import simhash_near_dups
    from skripsi_mapreduce_spark.operators.multimodal import (
        audio_fingerprint,
        make_wav,
    )

    # clip 0: amplitudes strictly decreasing -> every comparison true
    amps_desc = list(range(65, 0, -1))
    # clip 1: strictly increasing -> every comparison false
    amps_asc = list(range(1, 66))
    rows = [
        (0, "audio", make_wav([a * 100 for a in amps_desc for _ in range(4)]), None),
        (1, "audio", make_wav([a * 100 for a in amps_asc for _ in range(4)]), None),
    ]
    media = spark.createDataFrame(
        rows, schema="media_id long, kind string, content binary, meta string"
    )
    got = {r["media_id"]: (r["sim_hi"], r["sim_lo"]) for r in audio_fingerprint(media).collect()}
    assert got[0] == ((1 << 32) - 1, (1 << 32) - 1)  # all 64 bits set
    assert got[1] == (0, 0)

    rng = np.random.RandomState(5)
    rows, prev = [], None
    for i in range(40):
        if i % 10 == 9 and prev is not None:
            amps = list(prev)
            if i % 20 == 19:
                amps[0] = (amps[0] + 10000) % 30000
        else:
            amps = [int(v) for v in rng.randint(0, 30000, size=65)]
        prev = amps
        rows.append((i, "audio", make_wav([a for a in amps for _ in range(4)]), None))
    media = spark.createDataFrame(
        rows, schema="media_id long, kind string, content binary, meta string"
    )
    sig = audio_fingerprint(media).withColumnRenamed("media_id", "doc_id").localCheckpoint()
    blocked = sorted(map(tuple, simhash_near_dups(sig, max_hamming=4).collect()))
    allp = sorted(map(tuple, simhash_near_dups(sig, max_hamming=4, block=False).collect()))
    assert blocked == allp
    planted = {(i - 1, i) for i in range(40) if i % 10 == 9}
    assert planted <= {(a, b) for a, b, _ in blocked}


def test_image_incremental_cross_blocking_equals_all_pairs(spark):
    """simhash_near_dups_against (the cross-side pigeonhole join) must
    be row-identical to the O(|a|x|b|) audit kernel, and planted batch
    arrivals must hit their corpus base."""
    import numpy as np

    from skripsi_mapreduce_spark.operators.dedup import simhash_near_dups_against
    from skripsi_mapreduce_spark.operators.multimodal import image_dhash, make_ppm

    rng = np.random.RandomState(3)
    corp_rows, batch_rows, corp_px = [], [], {}
    for i in range(30):
        px = rng.randint(0, 256, size=(8, 9, 3)).astype(np.uint8)
        corp_px[i] = px
        corp_rows.append((i, "image", make_ppm(9, 8, px.tobytes()), None))
    for j in range(10):  # batch: 5 novel + 5 perturbed twins of corpus
        if j < 5:
            px = rng.randint(0, 256, size=(8, 9, 3)).astype(np.uint8)
        else:
            px = corp_px[j].copy()
            px[0, 0, :2] = (px[0, 0, :2].astype(int) + 128) % 256
        batch_rows.append((100 + j, "image", make_ppm(9, 8, px.tobytes()), None))
    schema = "media_id long, kind string, content binary, meta string"
    sig_c = image_dhash(spark.createDataFrame(corp_rows, schema)).withColumnRenamed(
        "media_id", "doc_id").localCheckpoint()
    sig_b = image_dhash(spark.createDataFrame(batch_rows, schema)).withColumnRenamed(
        "media_id", "doc_id").localCheckpoint()
    blocked = sorted(map(tuple, simhash_near_dups_against(sig_c, sig_b, 4).collect()))
    allp = sorted(map(tuple, simhash_near_dups_against(
        sig_c, sig_b, 4, block=False).collect()))
    assert blocked == allp
    got = {(a, b) for a, b, _ in blocked}
    assert {(j, 100 + j) for j in range(5, 10)} <= got  # twins found


def test_video_dhash_majority_and_sampling_rule(spark):
    """video_dhash's strict per-bit majority computed by hand, on a
    frame layout that DISTINGUISHES the sample_frames sampling rule
    from hashing every frame: with every_n=1, max_frames=4 the sampled
    frames are 0..3; pattern A fills frames 0-2 (3 of 4 sampled -> bit
    set) and pattern B fills frames 3-7 (1 of 4 sampled -> unset; a
    kernel that wrongly hashed all 8 frames would flip BOTH verdicts).
    Also pins the empty-content degenerate row to the zero signature."""
    import numpy as np

    from skripsi_mapreduce_spark.operators.multimodal import (
        make_ppm,
        make_ppm_video,
        video_dhash,
    )

    px_a = np.zeros((8, 9, 3), dtype=np.uint8)
    for y in range(8):
        px_a[y, : y + 1, :] = 255  # dHash bit set exactly at y*8+y
    px_b = np.zeros((8, 9, 3), dtype=np.uint8)
    for y in range(8):
        px_b[y, : y + 2, :] = 255  # bit set exactly at y*8+y+1 (x==y+1<=8)
    frame_a = make_ppm(9, 8, px_a.tobytes())
    frame_b = make_ppm(9, 8, px_b.tobytes())
    video = make_ppm_video([frame_a, frame_a, frame_a] + [frame_b] * 5)
    media = spark.createDataFrame(
        [(0, "video", video, None), (1, "video", b"", None)],
        schema="media_id long, kind string, content binary, meta string",
    )
    got = {
        r["media_id"]: (r["sim_hi"], r["sim_lo"])
        for r in video_dhash(media, every_n=1, max_frames=4).collect()
    }
    want_bits = {y * 8 + y for y in range(8)}  # A-majority only
    lo = sum(1 << b for b in want_bits if b < 32)
    hi = sum(1 << (b - 32) for b in want_bits if b >= 32)
    assert got[0] == (hi, lo)
    assert got[1] == (0, 0)  # empty video -> zero signature, no error


def test_video_dhash_equals_sampled_frame_majority(spark):
    """Composition parity: video_dhash must equal the strict per-bit
    majority of image_dhash over the frames sample_frames(decode_stub=
    False) selects — pinning that the video kernel shares the frame
    sampling rule and the per-frame dHash kernel with the existing
    operators rather than reimplementing them divergently."""
    import numpy as np

    from skripsi_mapreduce_spark.operators.multimodal import (
        image_dhash,
        make_ppm,
        make_ppm_video,
        sample_frames,
        video_dhash,
    )

    rng = np.random.RandomState(5)
    rows = []
    for i in range(12):
        n_frames = 3 + i % 6  # exercises fewer-frames-than-max too
        frames = [
            make_ppm(9, 8, rng.randint(0, 256, (8, 9, 3)).astype(np.uint8).tobytes())
            for _ in range(n_frames)
        ]
        rows.append((i, "video", make_ppm_video(frames), None))
    media = spark.createDataFrame(
        rows, schema="media_id long, kind string, content binary, meta string"
    )
    got = {
        r["media_id"]: (r["sim_hi"], r["sim_lo"])
        for r in video_dhash(media, every_n=2, max_frames=4).collect()
    }
    frames = sample_frames(media, every_n=2, max_frames=4, decode_stub=False)
    per_frame = image_dhash(
        frames.selectExpr(
            "media_id * 100 + frame_idx AS media_id",
            "'image' AS kind",
            "frame_bytes AS content",
        )
    ).collect()
    by_video: dict[int, list[tuple[int, int]]] = {}
    for r in per_frame:
        by_video.setdefault(int(r["media_id"]) // 100, []).append(
            (r["sim_hi"], r["sim_lo"])
        )
    for vid, sigs in by_video.items():
        n = len(sigs)
        bits = [
            sum(((lo >> b) & 1 if b < 32 else (hi >> (b - 32)) & 1) for hi, lo in sigs)
            for b in range(64)
        ]
        flat = [1 if 2 * c > n else 0 for c in bits]
        lo = sum(1 << b for b in range(32) if flat[b])
        hi = sum(1 << (b - 32) for b in range(32, 64) if flat[b])
        assert got[vid] == (hi, lo), vid


def test_video_near_dups_blocked_equals_all_pairs(spark):
    """The pigeonhole-blocked video near-dup join must be row-identical
    to the all-pairs verify on the same majority signatures, with
    planted exact and sampled-frame-perturbed twins all found."""
    import numpy as np

    from skripsi_mapreduce_spark.operators.dedup import simhash_near_dups
    from skripsi_mapreduce_spark.operators.multimodal import (
        make_ppm,
        make_ppm_video,
        video_dhash,
    )

    rng = np.random.RandomState(17)
    rows = []
    base_frames = None
    for i in range(40):
        if i % 10 == 9 and base_frames is not None:
            frames = list(base_frames)
            if i % 20 == 19:  # perturb SAMPLED frame 2's pixel 0
                px = np.frombuffer(frames[2], dtype=np.uint8)[-216:].reshape(8, 9, 3)
                px = px.copy()
                px[0, 0, :2] = (px[0, 0, :2].astype(int) + 128) % 256
                frames[2] = make_ppm(9, 8, px.tobytes())
        else:
            frames = [
                make_ppm(
                    9, 8, rng.randint(0, 256, (8, 9, 3)).astype(np.uint8).tobytes()
                )
                for _ in range(8)
            ]
        base_frames = frames
        rows.append((i, "video", make_ppm_video(frames), None))
    media = spark.createDataFrame(
        rows, schema="media_id long, kind string, content binary, meta string"
    )
    sig = video_dhash(media).withColumnRenamed("media_id", "doc_id").localCheckpoint()
    blocked = sorted(map(tuple, simhash_near_dups(sig, max_hamming=4).collect()))
    allp = sorted(map(tuple, simhash_near_dups(sig, max_hamming=4, block=False).collect()))
    assert blocked == allp
    planted = {(i - 1, i) for i in range(40) if i % 10 == 9}
    got_pairs = {(a, b) for a, b, _ in blocked}
    assert planted <= got_pairs
    ham = {(a, b): h for a, b, h in blocked}
    assert all(ham[(i - 1, i)] == 0 for i in range(40) if i % 20 == 9)


def test_video_dhash_single_frame_equals_image_dhash(spark):
    """A one-frame video's majority signature IS that frame's dHash
    (majority of one = the frame's bits) — pins the video kernel to the
    image kernel on the degenerate frame count."""
    import numpy as np

    from skripsi_mapreduce_spark.operators.multimodal import (
        image_dhash,
        make_ppm,
        make_ppm_video,
        video_dhash,
    )

    rng = np.random.RandomState(23)
    frames = {
        i: make_ppm(9, 8, rng.randint(0, 256, (8, 9, 3)).astype(np.uint8).tobytes())
        for i in range(6)
    }
    vmedia = spark.createDataFrame(
        [(i, "video", make_ppm_video([f]), None) for i, f in frames.items()],
        schema="media_id long, kind string, content binary, meta string",
    )
    imedia = spark.createDataFrame(
        [(i, "image", f, None) for i, f in frames.items()],
        schema="media_id long, kind string, content binary, meta string",
    )
    v = {r["media_id"]: (r["sim_hi"], r["sim_lo"]) for r in video_dhash(vmedia).collect()}
    im = {r["media_id"]: (r["sim_hi"], r["sim_lo"]) for r in image_dhash(imedia).collect()}
    assert v == im


def test_engine_side_fixture_blobs_match_python_builders(spark):
    """The round-9 engine-side fixture builders (_af_wav_blob /
    _vh_video_blob — pure column expressions) must be BYTE-IDENTICAL to
    the per-doc Python builders they replaced: the adjudicated entries'
    correctness rests on the oracle restating these exact bytes'
    decode, so fixture construction may never drift from the closed
    form. Covers base docs, byte-exact twins (% 20 == 9), and perturbed
    twins (% 20 == 19)."""
    import hashlib

    from pyspark.sql import functions as F

    from skripsi_mapreduce_spark.operators.multimodal import make_ppm_video, make_wav
    from skripsi_mapreduce_spark.plans.extensions2 import (
        _AF_AMPMOD,
        _AF_SEGLEN,
        _AF_SEGS,
        _DH_H,
        _DH_W,
        _VH_FRAMES,
        _VH_TWIN_FRAME,
        _WAV_RATE,
        _af_wav_blob,
        _vh_video_blob,
    )

    ids = [0, 1, 8, 9, 19, 28, 29, 39, 100, 119]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    did = F.col("doc_id")
    base = F.when(did % 10 == 9, did - 1).otherwise(did).cast("string")
    rows = df.select(
        "doc_id",
        _af_wav_blob(base, did % 20 == 19).alias("wav"),
        _vh_video_blob(base, did % 20 == 19).alias("vid"),
    ).collect()

    def wav_for(doc: int) -> bytes:
        b = doc - 1 if doc % 10 == 9 else doc
        amps = [
            int(hashlib.md5(f"{b}:{s}".encode()).hexdigest()[:4], 16) % _AF_AMPMOD
            for s in range(_AF_SEGS)
        ]
        if doc % 20 == 19:
            amps[0] = (amps[0] + 10000) % _AF_AMPMOD
        return make_wav([a for a in amps for _ in range(_AF_SEGLEN)], _WAV_RATE)

    def video_for(doc: int) -> bytes:
        b = doc - 1 if doc % 10 == 9 else doc
        twin = doc % 20 == 19
        header = f"P6\n{_DH_W} {_DH_H}\n255\n".encode()
        frames = []
        for f in range(_VH_FRAMES):
            chunks = [
                hashlib.md5(f"{b}:{f}:{c}".encode()).digest() for c in range(15)
            ]
            raster = bytearray(
                b"".join(c[:15] for c in chunks[:14]) + chunks[14][:6]
            )
            if twin and f == _VH_TWIN_FRAME:
                raster[0] = (raster[0] + 128) % 256
                raster[1] = (raster[1] + 128) % 256
            frames.append(header + bytes(raster))
        return make_ppm_video(frames)

    for r in rows:
        assert bytes(r["wav"]) == wav_for(r["doc_id"]), r["doc_id"]
        assert bytes(r["vid"]) == video_for(r["doc_id"]), r["doc_id"]


def test_fuzzed_codec_blobs_raise_only_named_errors():
    """Deterministic fuzz over mutated/truncated/spliced encoder
    outputs for all three codec-free lanes: decode either succeeds or
    raises the module's named types (OSError / NotImplementedError /
    ValueError) — never an anonymous struct.error / IndexError that
    would surface as an opaque task failure from the mapInPandas
    kernels. The round-11 pass caught _decode_wav leaking struct.error
    on a truncated fmt chunk (now a named 'fmt chunk truncated')."""
    import random

    import numpy as np

    from skripsi_mapreduce_spark.operators.multimodal import _decode_png, make_png

    rng_np = np.random.RandomState(3)
    rgb = bytes(rng_np.randint(0, 256, 16 * 12 * 3, dtype=np.uint8))
    cases = [
        (_decode_png, make_png(16, 12, rgb)),
        (_decode_ppm, make_ppm(16, 12, rgb)),
        (_decode_wav, make_wav([int(x) for x in rng_np.randint(-30000, 30000, 200)])),
    ]
    rng = random.Random(7)
    for fn, base in cases:
        for _ in range(800):
            blob = bytearray(base)
            op = rng.randrange(4)
            if op == 0:
                blob[rng.randrange(len(blob))] = rng.randrange(256)
            elif op == 1:
                blob = blob[: rng.randrange(1, len(blob))]
            elif op == 2:
                for _ in range(rng.randrange(1, 6)):
                    blob[rng.randrange(len(blob))] = rng.randrange(256)
            else:
                i = rng.randrange(len(blob))
                blob = (
                    blob[:i]
                    + bytes(rng.randrange(256) for _ in range(rng.randrange(1, 4)))
                    + blob[i:]
                )
            try:
                fn(bytes(blob))
            except (OSError, NotImplementedError, ValueError):
                pass
