"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode policy (``decode_stub``):

- ``decode_stub=True`` (default): deterministic fake outputs with the
  REAL Spark-side plumbing — schema, Arrow batch shapes, ``mapInPandas``
  signatures, partitioning — all exercised and tested.
- ``decode_stub=False``: REAL decoding for the codec-free formats this
  module implements from their public specs with stdlib struct/zlib/
  numpy alone — PCM WAV (RIFF chunks, 16-bit) for audio, binary PPM (P6)
  and 8-bit PNG (inflate + unfiltering) for images, BASELINE JPEG
  (sequential DCT + Huffman, operators/jpeg.py — round 10) covering the
  process every camera and web encoder emits, PPM-sequence containers
  for video frames, detected by magic bytes. Formats whose codecs
  genuinely aren't in this container (webp/mp3/mp4, and JPEG's
  progressive/arithmetic tiers) raise ``NotImplementedError`` naming
  them; swapping in PIL/librosa/pyav changes only the inner
  ``_decode_*`` functions, nothing in the plan.

Scale design: media bytes stay in executor-side Arrow batches end to end
(never collected); per-batch work is vectorized over pandas; feature
outputs are fixed-width columns so downstream joins/aggregations shuffle
features, not media. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low (e.g. 64)
for video-sized blobs so a batch stays under executor memory.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import local_df

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, content_hash string, "
    "width int, height int, mean_luma double, feature array<float>"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, content_hash string, "
    "duration_ms int, sample_rate int, rms double, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_bytes binary, frame_hash string"


# ---------------------------------------------------------------------------
# Codec-free encoders/decoders (public specs, stdlib-only)
# ---------------------------------------------------------------------------
def make_wav(samples, sample_rate: int = 16000) -> bytes:
    """Encode int16 mono samples as a canonical PCM WAV (RIFF) blob."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def _decode_wav(b: bytes):
    """(sample_rate, np.int16 samples) from a PCM WAV blob (chunk walk —
    tolerates extra chunks like LIST/INFO)."""
    import numpy as np

    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, rate, channels, bits, data = 12, None, 1, 16, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            # a truncated/corrupt fmt chunk must raise the module's
            # named error, not struct.error (round-11 fuzz catch)
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt, channels, rate = struct.unpack("<HHI", body[0:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV is codec-free")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels > 1:  # downmix to mono for features
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1).astype("<i2")
    return rate, samples


def make_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes (len = w*h*3) as binary PPM (P6, maxval 255)."""
    assert len(rgb) == width * height * 3
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def _decode_ppm(b: bytes):
    """(width, height, np.uint8 array (h, w, 3)) from a P6 PPM blob."""
    import numpy as np

    if b[0:2] != b"P6":
        raise ValueError("not a P6 PPM blob")
    # header = three whitespace-separated ints after the magic; '#' starts
    # a comment running to end of line
    vals, pos = [], 2
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = vals
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    raster = np.frombuffer(b[pos : pos + w * h * 3], dtype=np.uint8)
    return w, h, raster.reshape(h, w, 3)


PNG_SIG = b"\x89PNG\r\n\x1a\n"
from .jpeg import JPEG_SIG  # noqa: E402  (magic for the dispatch)


def make_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes (len = w*h*3) as a minimal valid PNG
    (8-bit truecolor, non-interlaced, filter 0 rows) — stdlib only."""
    import zlib

    assert len(rgb) == width * height * 3

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + rgb[y * width * 3 : (y + 1) * width * 3] for y in range(height)
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_png(b: bytes):
    """(width, height, np.uint8 array (h, w, 3)) from a PNG blob —
    implemented from the public spec with stdlib zlib: chunk walk, IDAT
    inflate, per-row unfiltering (none/sub/up/average/paeth). Supports
    8-bit grey / grey+alpha / RGB / RGBA, non-interlaced (alpha dropped,
    grey replicated to RGB); palette, 16-bit, and interlaced images raise
    NotImplementedError. Pure-Python row loop — fine for feature
    extraction on thumbnails/frames; swap in PIL for bulk photos."""
    import zlib

    import numpy as np

    if b[:8] != PNG_SIG:
        raise ValueError("not a PNG blob")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if (zlib.crc32(ctype + data) & 0xFFFFFFFF) != int.from_bytes(
            b[pos + 8 + ln : pos + 12 + ln], "big"
        ):
            raise OSError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_v, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype_v)
    if depth != 8 or channels is None or interlace != 0 or comp != 0 or filt != 0:
        raise NotImplementedError(
            "PNG subset: 8-bit grey/grey-alpha/RGB/RGBA non-interlaced "
            f"(got depth={depth} colortype={ctype_v} interlace={interlace})"
        )
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise OSError("PNG decompressed size mismatch")
    out = bytearray(h * stride)
    prev = bytes(stride)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 1:  # sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ftype == 2:  # up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                up = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            raise OSError(f"PNG: unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, channels)
    if ctype_v == 0:
        px = np.repeat(px, 3, axis=2)
    elif ctype_v == 4:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    elif ctype_v == 6:
        px = px[:, :, :3]
    return w, h, px


def _decode_image(b: bytes):
    """(w, h, px[h, w, 3] uint8) for any supported image blob, dispatched
    on magic bytes: P6 PPM, 8-bit PNG, baseline JPEG (operators/jpeg.py
    — round 10; its progressive/arithmetic tiers raise inside). webp
    stays honestly gated. The ONE dispatch point every image kernel
    (features, dHash, resize) shares."""
    if b[:2] == b"P6":
        return _decode_ppm(b)
    if b[:8] == PNG_SIG:
        return _decode_png(b)
    if b[:2] == JPEG_SIG:
        from .jpeg import decode_jpeg

        return decode_jpeg(b)
    raise NotImplementedError(
        "webp image decode requires PIL/opencv — not in this container; "
        "codec-free paths support P6 PPM, 8-bit PNG, and baseline JPEG"
    )


def make_ppm_video(frames: list[bytes]) -> bytes:
    """Encode a frame list as a PPM-sequence "video": the concatenation of
    P6 blobs (the natural codec-free container — ffmpeg's image2pipe
    emits exactly this for `-c:v ppm`)."""
    assert all(f[:2] == b"P6" for f in frames)
    return b"".join(frames)


def _split_ppm_sequence(b: bytes) -> list[bytes]:
    """Split a PPM-sequence blob into its P6 frame blobs by walking
    headers: each frame's length is its header size + w*h*3 raster."""
    if b[:2] != b"P6":
        raise NotImplementedError(
            "compressed video containers (mp4/webm) require pyav/ffmpeg — "
            "not in this container; codec-free path supports PPM sequences"
        )
    frames, pos = [], 0
    while pos < len(b):
        if b[pos : pos + 2] != b"P6":
            raise ValueError(f"corrupt PPM sequence at offset {pos}")
        # header = three whitespace-separated ints after the magic
        # ('#' comments run to end of line), then ONE whitespace byte
        vals, p = [], pos + 2
        while len(vals) < 3:
            while p < len(b) and b[p : p + 1].isspace():
                p += 1
            if b[p : p + 1] == b"#":
                while p < len(b) and b[p] != 0x0A:
                    p += 1
                continue
            start = p
            while p < len(b) and not b[p : p + 1].isspace():
                p += 1
            vals.append(int(b[start:p]))
        p += 1
        w, h, _maxval = vals
        end = p + w * h * 3
        if end > len(b):
            raise ValueError("truncated PPM frame raster")
        frames.append(b[pos:end])
        pos = end
    return frames


def _image_features_real(b: bytes):
    """(width, height, mean_luma, 8-dim feature) from a decodable image.
    Feature = [meanR, meanG, meanB, luma std, 4 quadrant luma means], all
    in [0, 1] — deterministic real statistics, a stand-in embedding until
    a model forward pass replaces it."""
    import numpy as np

    w, h, px = _decode_image(b)
    f = px.astype(np.float64)
    luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    hh, wh = max(h // 2, 1), max(w // 2, 1)
    quads = [luma[:hh, :wh], luma[:hh, wh:], luma[hh:, :wh], luma[hh:, wh:]]
    feat = [
        float(f[:, :, 0].mean() / 255.0),
        float(f[:, :, 1].mean() / 255.0),
        float(f[:, :, 2].mean() / 255.0),
        float(luma.std() / 255.0),
        *[float(q.mean() / 255.0) if q.size else 0.0 for q in quads],
    ]
    return w, h, float(luma.mean() / 255.0), feat


def _audio_features_real(b: bytes):
    """(duration_ms, sample_rate, rms, 8-band energy feature) from a PCM
    WAV blob. RMS and band energies are in [0, 1] (full-scale int16)."""
    import numpy as np

    rate, samples = _decode_wav(b)
    n = len(samples)
    dur_ms = int(round(n * 1000 / rate)) if rate else 0
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt((x * x).mean())) if n else 0.0
    bands = []
    for i in range(8):
        seg = x[i * n // 8 : (i + 1) * n // 8]
        bands.append(float(np.sqrt((seg * seg).mean())) if seg.size else 0.0)
    return dur_ms, rate, rms, bands


def _fake_embedding(seed_bytes: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector derived from content bytes.
    REPLACE with a real model forward pass when codecs are available."""
    import hashlib

    h = hashlib.md5(seed_bytes or b"").digest()
    return [((h[i % 16] / 255.0) * 2 - 1) for i in range(dim)]


def extract_image_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Image decode + feature extraction over Arrow batches.

    With ``decode_stub`` the decoded dimensions come from the metadata
    struct and the luma/embedding from a content-hash-derived fake; the
    batch iteration, schema, and partition behavior are production-real.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            content = pdf["content"]
            if decode_stub:
                width = pdf["meta"].map(lambda m: m["width"] if m else None)
                height = pdf["meta"].map(lambda m: m["height"] if m else None)
                luma = content.map(
                    lambda b: (sum(b[:64]) / max(min(len(b), 64), 1)) / 255.0 if b else 0.0
                )
                feat = content.map(_fake_embedding)
            else:
                decoded = content.map(lambda b: _image_features_real(bytes(b or b"")))
                width = decoded.map(lambda d: d[0])
                height = decoded.map(lambda d: d[1])
                luma = decoded.map(lambda d: d[2])
                feat = decoded.map(lambda d: d[3])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "width": width,
                    "height": height,
                    "mean_luma": luma,
                    "feature": feat,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(op, IMAGE_FEATURES_SCHEMA)


def extract_audio_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Audio decode + RMS/feature extraction (stubbed decode, real plumbing)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            content = pdf["content"]
            if decode_stub:
                duration = pdf["meta"].map(lambda m: m["duration_ms"] if m else None)
                rate = pdf["meta"].map(lambda m: m["sample_rate"] if m else None)
                rms = content.map(
                    lambda b: (sum(x * x for x in b[:64]) / max(min(len(b), 64), 1)) ** 0.5
                    / 255.0
                    if b
                    else 0.0
                )
                feat = content.map(_fake_embedding)
            else:
                decoded = content.map(lambda b: _audio_features_real(bytes(b or b"")))
                duration = decoded.map(lambda d: d[0])
                rate = decoded.map(lambda d: d[1])
                rms = decoded.map(lambda d: d[2])
                feat = decoded.map(lambda d: d[3])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": content.map(lambda b: hashlib.md5(b or b"").hexdigest()),
                    "duration_ms": duration,
                    "sample_rate": rate,
                    "rms": rms,
                    "feature": feat,
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(op, AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2, max_frames: int = 4,
                  decode_stub: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (row
    explosion happens executor-side inside the Arrow batch, so a video
    never rides the shuffle whole).

    ``decode_stub=False`` does REAL frame extraction for the codec-free
    PPM-sequence container (concatenated P6 blobs, see make_ppm_video);
    each sampled frame is emitted as its standalone P6 blob, directly
    consumable by extract_image_features. Compressed containers (mp4/webm)
    raise ``NotImplementedError`` naming the missing codec libraries."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b = bytes(r["content"] or b"")
                if decode_stub:
                    # stub: treat each 64-byte slice as one "frame"
                    n = max(len(b) // 64, 1)
                    sampled = [
                        (fi, b[fi * 64 : (fi + 1) * 64])
                        for fi in range(0, min(n, max_frames * every_n), every_n)
                    ]
                else:
                    frames = _split_ppm_sequence(b) if b else []
                    sampled = [
                        (fi, frames[fi])
                        for fi in range(
                            0, min(len(frames), max_frames * every_n), every_n
                        )
                    ]
                for fi, fb in sampled:
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": fi,
                            "frame_bytes": fb,
                            "frame_hash": hashlib.md5(fb).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_bytes", "frame_hash"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(op, FRAME_SAMPLE_SCHEMA)


def synthetic_codec_media(spark, n: int = 8, seed: int = 7) -> DataFrame:
    """Media table whose blobs are REAL codec-free files (PCM WAV sine
    waves, solid-and-gradient P6 PPMs, PPM-sequence videos) so
    ``decode_stub=False`` exercises genuine decoding end to end."""
    import math
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i % 4 == 3:  # PPM-sequence video: 6 tiny solid frames
            w, h = 4, 3
            frames = [
                make_ppm(w, h, bytes((f * 40 % 256, i * 30 % 256, 90)) * (w * h))
                for f in range(6)
            ]
            meta = {"mime": "video/x-ppm-sequence", "width": w, "height": h,
                    "duration_ms": 6 * 40, "sample_rate": None}
            rows.append((i, "video", make_ppm_video(frames), meta))
        elif i % 2 == 0:  # WAV: 1 kHz-ish sine, amplitude varies per row
            rate, amp, freq = 8000, 8000 + 1000 * (i % 4), 440.0 * (1 + i % 3)
            samples = [
                int(amp * math.sin(2 * math.pi * freq * t / rate)) for t in range(rate // 4)
            ]
            blob = make_wav(samples, rate)
            meta = {"mime": "audio/wav", "width": None, "height": None,
                    "duration_ms": 250, "sample_rate": rate}
            rows.append((i, "audio", blob, meta))
        else:  # image: PPM or PNG (both real codec-free decodes)
            w, h = 8 + i, 6 + i
            color = (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            rgb = bytes(color) * (w * h)
            if (i // 4) % 2 == 0:  # alternate: i=1 PPM, i=5 PNG, ...
                blob, mime = make_ppm(w, h, rgb), "image/x-portable-pixmap"
            else:
                blob, mime = make_png(w, h, rgb), "image/png"
            meta = {"mime": mime, "width": w, "height": h,
                    "duration_ms": None, "sample_rate": None}
            rows.append((i, "image", blob, meta))
    return local_df(spark, rows, MEDIA_SCHEMA)


def synthetic_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/demos (round-trip fixture
    for the M1 contract: binary + struct metadata columns)."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        blob = bytes(rng.randrange(256) for _ in range(128 + (i % 5) * 64))
        rows.append(
            (
                i,
                kind,
                blob,
                {
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 64 + i if kind == "image" else None,
                    "height": 48 + i if kind == "image" else None,
                    "duration_ms": 1000 * (i + 1) if kind != "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                },
            )
        )
    return local_df(spark, rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, width int, height int, content binary"
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize over the REAL decoded raster, binary in →
    binary out: each image blob decodes to its (h, w, 3) uint8 array —
    dispatched on MAGIC BYTES (_decode_image: P6 PPM, from-spec PNG,
    baseline JPEG; webp raises — honestly gated) — output pixel
    (ox, oy) samples source pixel (ox·w//out_w, oy·h//out_h) — the
    integer NN convention every image library uses — and the result
    re-encodes in the INPUT's container (PPM→PPM, PNG→PNG, so a mixed
    media table round-trips each blob through its own format). Runs as
    one Arrow-batched mapInPandas pass (numpy fancy-indexing per image,
    no per-pixel Python loop); at 100 TB this is the write-time
    thumbnail stage: map-side, shuffle-free, output rows are
    (id, w, h, bytes).

    Returns (media_id, width, height, content) for rows with
    kind == 'image'."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "content": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(blob or b"")
                w, h, px = _decode_image(raw)
                sx = (np.arange(out_w) * w) // out_w
                sy = (np.arange(out_h) * h) // out_h
                resized = px[sy][:, sx]  # (out_h, out_w, 3) via NN gather
                if raw[:8] == PNG_SIG:
                    enc = make_png
                elif raw[:2] == JPEG_SIG:
                    # re-encode at quality=100 (all-ones tables): for the
                    # flat-tile fixtures this is exactly lossless, and NN
                    # gather of flat 8x8 tiles keeps blocks flat
                    from .jpeg import make_jpeg

                    def enc(ww, hh, body):
                        return make_jpeg(ww, hh, body, quality=100)
                else:
                    enc = make_ppm
                out["media_id"].append(mid)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["content"].append(enc(out_w, out_h, resized.tobytes()))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(op, RESIZED_SCHEMA)


DHASH_SCHEMA = "media_id long, sim_hi long, sim_lo long"


def image_dhash(media: DataFrame) -> DataFrame:
    """64-bit difference hash (dHash) over the REAL decoded raster —
    the standard perceptual fingerprint for image near-dedup, the
    multimodal twin of text SimHash (the reference pipelines dedup
    text only — this extends the same blocking-friendly signature idea
    to the image column family, a stage every multimodal training-data
    pipeline runs before captioning).

    Per image: decode by magic bytes (P6 PPM / 8-bit PNG / baseline
    JPEG — webp stays honestly gated, see _decode_image), nearest-neighbor resample to
    a 9x8 luma grid with the SAME integer index map as resize_images
    (sx = ox*w//9, sy = oy*h//8), then bit (x, y) = 1 iff
    luma(x, y) > luma(x+1, y) for x in 0..7, y in 0..7 — 64 bits, bit
    index y*8+x. Luma is the INTEGER Rec.601 form 299R + 587G + 114B
    (x1000 scale) so every comparison is exact integer math an external
    SQL oracle can restate bit-for-bit — no float anywhere.

    Returns (media_id, sim_hi, sim_lo): the signature split into two
    nonnegative 32-bit lanes, the exact shape dedup.simhash_near_dups
    blocks on — image near-dedup is then one pigeonhole-blocked
    self-join away (see the mm_image_near_dups entry). One Arrow-batched
    mapInPandas pass, numpy per image, media bytes never leave the
    executor; output rows are 3 longs, so the downstream blocking
    shuffles signatures, never pixels."""
    import numpy as np

    pow_lo = (1 << np.arange(32, dtype=np.int64))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                flat = _dhash_bits(bytes(blob or b""), np)
                ids.append(mid)
                los.append(int(flat[:32] @ pow_lo))
                his.append(int(flat[32:] @ pow_lo))
            yield pd.DataFrame({"media_id": ids, "sim_hi": his, "sim_lo": los})

    return media.filter(F.col("kind") == "image").mapInPandas(op, DHASH_SCHEMA)


def _dhash_bits(raw: bytes, np):
    """The 64 dHash bits of one encoded image as an int64[64] vector
    (bit index y*8 + x) — the exact-integer kernel shared by
    :func:`image_dhash` (one image per row) and :func:`video_dhash`
    (per sampled frame): decode by magic bytes, NN-resample to a 9x8
    grid (sx = ox*w//9, sy = oy*h//8 — the resize_images index map),
    integer Rec.601 luma (299R + 587G + 114B), bit = left > right."""
    w, h, px = _decode_image(raw)
    sx = (np.arange(9) * w) // 9
    sy = (np.arange(8) * h) // 8
    g = px[sy][:, sx].astype(np.int64)  # (8, 9, 3) NN gather
    luma = 299 * g[:, :, 0] + 587 * g[:, :, 1] + 114 * g[:, :, 2]
    bits = (luma[:, :-1] > luma[:, 1:]).astype(np.int64)  # (8, 8)
    return bits.reshape(-1)  # bit index = y*8 + x


def video_dhash(
    media: DataFrame, every_n: int = 2, max_frames: int = 4
) -> DataFrame:
    """64-bit perceptual VIDEO signature — the video member of the
    multimodal fingerprint family (image :func:`image_dhash`, audio
    :func:`audio_fingerprint`): sample frames from the codec-free
    PPM-sequence container with the SAME rule as :func:`sample_frames`
    (frame indices ``range(0, min(n, max_frames*every_n), every_n)``),
    compute each sampled frame's 64 dHash bits with the shared
    :func:`_dhash_bits` kernel, and reduce them to one signature by
    STRICT per-bit majority vote (bit set iff ``2*count > n_sampled``;
    ties on an even frame count round to 0) — the standard
    temporal-pooling step of published video perceptual hashes, and
    pure integer logic an external SQL oracle can restate bit-for-bit.

    Returns (media_id, sim_hi, sim_lo), the two nonnegative 32-bit
    lanes dedup.simhash_near_dups blocks on — video near-dedup is one
    pigeonhole-blocked join away (mm_video_near_dups entry). A video
    with no decodable frames hashes to the all-zero signature rather
    than erroring (same degenerate-row contract as the other lanes).

    Scale: ONE mapInPandas pass; frame split, decode, per-frame hash,
    and the majority vote all happen executor-side on the single Arrow
    row that holds the video, so the shuffle that follows carries 24
    bytes per video, never frames. Compressed containers (mp4/webm)
    raise NotImplementedError from the splitter, naming the missing
    codec — same honest gate as sample_frames."""
    import numpy as np

    pow_lo = (1 << np.arange(32, dtype=np.int64))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(blob or b"")
                frames = _split_ppm_sequence(raw) if raw else []
                sampled = [
                    frames[fi]
                    for fi in range(
                        0, min(len(frames), max_frames * every_n), every_n
                    )
                ]
                if sampled:
                    stack = np.stack([_dhash_bits(f, np) for f in sampled])
                    flat = (2 * stack.sum(axis=0) > len(sampled)).astype(np.int64)
                else:
                    flat = np.zeros(64, dtype=np.int64)
                ids.append(mid)
                los.append(int(flat[:32] @ pow_lo))
                his.append(int(flat[32:] @ pow_lo))
            yield pd.DataFrame({"media_id": ids, "sim_hi": his, "sim_lo": los})

    return media.filter(F.col("kind") == "video").mapInPandas(op, DHASH_SCHEMA)


def audio_fingerprint(media: DataFrame, n_segments: int = 65) -> DataFrame:
    """64-bit audio fingerprint over the REAL decoded PCM stream — the
    audio twin of :func:`image_dhash` (an energy-difference hash, the
    shape acoustic fingerprinters like Chromaprint reduce to): decode
    the WAV (RIFF chunk walk, PCM16 — compressed codecs stay honestly
    gated), split the samples into ``n_segments`` integer-boundary
    segments (start of segment s = s*n//n_segments, the same index map
    discipline as the raster resample), take each segment's ENERGY as
    the exact int64 sum of squared int16 samples, and set bit b iff
    energy(b) > energy(b+1) — n_segments-1 comparisons, so the default
    65 segments yield the 64-bit signature dedup.simhash_near_dups
    blocks on. Pure integer math end to end; an external SQL oracle
    restates every bit. Returns (media_id, sim_hi, sim_lo); one
    Arrow-batched mapInPandas pass, audio bytes never leave the
    executor, downstream blocking shuffles 24 bytes per clip."""
    import numpy as np

    if n_segments < 2 or n_segments > 65:
        raise ValueError("n_segments must be in [2, 65] (bits = n_segments - 1)")
    pow_lo = (1 << np.arange(32, dtype=np.int64))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                _rate, samples = _decode_wav(bytes(blob or b""))
                x = samples.astype(np.int64)
                n = len(x)
                bounds = (np.arange(n_segments + 1) * n) // n_segments
                sq = np.concatenate(([0], np.cumsum(x * x)))
                e = sq[bounds[1:]] - sq[bounds[:-1]]  # exact int64 energies
                bits = (e[:-1] > e[1:]).astype(np.int64)
                flat = np.zeros(64, dtype=np.int64)
                flat[: len(bits)] = bits
                ids.append(mid)
                los.append(int(flat[:32] @ pow_lo))
                his.append(int(flat[32:] @ pow_lo))
            yield pd.DataFrame({"media_id": ids, "sim_hi": his, "sim_lo": los})

    return media.filter(F.col("kind") == "audio").mapInPandas(op, DHASH_SCHEMA)
