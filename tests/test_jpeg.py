"""From-spec baseline JPEG codec (operators/jpeg.py): round trips, an
independent numpy reference for the lossy math, layout/marker edges,
and the multimodal dispatch that puts JPEG blobs on the same Spark
plumbing as PPM/PNG."""

from __future__ import annotations

import numpy as np
import pytest

from skripsi_mapreduce_spark.operators.jpeg import (
    ZIGZAG,
    _build_huffman,
    _dct_matrix,
    decode_jpeg,
    make_jpeg,
)


def _flat_tile_grey(tiles_w: int, tiles_h: int, seed: int = 7) -> np.ndarray:
    """(h, w, 3) uint8 image of flat 8x8 grey tiles — every 8x8 block is
    constant, so quality=100 JPEG is exactly lossless on it."""
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 256, size=(tiles_h, tiles_w), dtype=np.int64)
    g = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    return np.stack([g, g, g], axis=2)


def test_zigzag_is_the_standard_scan():
    want_head = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[:16] == want_head
    assert ZIGZAG[-4:] == [53, 60, 61, 54][-4:] or sorted(ZIGZAG) == list(range(64))
    assert sorted(ZIGZAG) == list(range(64))


def test_flat_tile_grey_roundtrip_exact_all_layouts():
    """Flat 8x8 grey tiles at quality=100: DC-only integral blocks and
    grey YCbCr (Y=v, Cb=Cr=128) make the round trip EXACT through
    4:4:4, 4:2:0 (chroma constant, so the box subsample is lossless
    too) and grayscale — the adjudicated-fixture mode."""
    img = _flat_tile_grey(9, 8)
    h, w = img.shape[:2]
    for kw in ({"subsampling": "444"}, {"subsampling": "420"}, {"grayscale": True}):
        blob = make_jpeg(w, h, img.tobytes(), quality=100, **kw)
        dw, dh, px = decode_jpeg(blob)
        assert (dw, dh) == (w, h)
        assert np.array_equal(px, img), kw


def test_flat_color_tiles_roundtrip_exact_444():
    """Flat COLOR tiles: 4:4:4 q=100 round-trips through the integer
    YCbCr<->RGB pair exactly when the forward-rounded YCbCr triple maps
    back onto the original bytes — pinned on a deterministic tile set
    by comparing against the reference color math below (not assumed
    identity)."""
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 256, size=(4, 5, 3), dtype=np.int64)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    h, w = img.shape[:2]
    blob = make_jpeg(w, h, img.tobytes(), quality=100)
    dw, dh, px = decode_jpeg(blob)
    f = img.astype(np.float64)
    y = np.round(0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2])
    cb = np.round(128 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2])
    cr = np.round(128 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2])
    want = np.stack(
        [
            np.round(y + 1.402 * (cr - 128)),
            np.round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
            np.round(y + 1.772 * (cb - 128)),
        ],
        axis=2,
    ).clip(0, 255).astype(np.uint8)
    assert np.array_equal(px, want)


def _independent_dct() -> np.ndarray:
    """8-point orthonormal DCT-II basis written WITHOUT importing
    jpeg._dct_matrix (round-10 verdict #2: the reference pipeline shared
    the codec's basis, so a wrong basis would have cancelled out of the
    strongest pixel-exact pin). Built from the T.81 A.3.3 definition
    with stdlib math — any perturbation of the codec's basis now fails
    the q=100/q=75 bit-exact pins below. The argument grouping matches
    the canonical ``(2x+1)·u·π/16`` form deliberately: a re-grouped
    ``π·u·(2x+1)/16`` differs by ~6e-17 per entry, which is enough to
    flip exact-.5 roundings downstream (measured: 2/255 pixel diffs),
    so value-level independence and bit-exactness are incompatible —
    the independence here is at the CODE level (nothing imported; a
    codec bug must be re-invented, not inherited, to cancel)."""
    import math

    rows = []
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        rows.append(
            [0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0) for x in range(8)]
        )
    return np.array(rows, dtype=np.float64)


def test_independent_dct_agrees_with_codec_basis():
    """Canary: the independently-written basis must agree bit-for-bit
    with the codec's (both are the correctly-evaluated T.81 definition;
    any perturbation of either side diverges loudly), and it must be
    orthonormal — A·Aᵀ = I pins the definition itself, not just
    agreement between two copies of the same mistake."""
    A = _independent_dct()
    assert np.array_equal(A, _dct_matrix(np))
    assert np.allclose(A @ A.T, np.eye(8), atol=1e-14)
    # DC row is the flat vector 1/(2*sqrt(2)) — a transposition or
    # index bug in either construction breaks this closed form
    assert np.allclose(A[0], 1.0 / (2.0 * np.sqrt(2.0)))


def _reference_pipeline(img: np.ndarray, ql: np.ndarray, qc: np.ndarray) -> np.ndarray:
    """Independent numpy twin of the 4:4:4 lossy math (color convert ->
    per-block DCT -> quantize round -> dequantize -> IDCT -> clamp ->
    inverse color) sharing only the mathematical definitions with the
    codec — it exercises none of the Huffman/zigzag/marker layers and
    carries its OWN DCT basis, so agreement pins those layers plus the
    basis itself."""
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    y = np.round(0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2])
    cb = np.round(128 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2])
    cr = np.round(128 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2])
    A = _independent_dct()
    planes = []
    for plane, q in ((y, ql), (cb, qc), (cr, qc)):
        out = np.zeros_like(plane)
        for by in range(0, h, 8):
            for bx in range(0, w, 8):
                blk = plane[by : by + 8, bx : bx + 8] - 128.0
                coef = np.round((A @ blk @ A.T) / q) * q
                out[by : by + 8, bx : bx + 8] = A.T @ coef @ A + 128.0
        planes.append(np.clip(np.round(out), 0, 255))
    y, cb, cr = planes
    rgb = np.stack(
        [
            np.round(y + 1.402 * (cr - 128)),
            np.round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
            np.round(y + 1.772 * (cb - 128)),
        ],
        axis=2,
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


def test_random_image_matches_independent_reference_q100_and_q75():
    """Arbitrary pixels (every block has dense AC): the decode of the
    encode must equal the independent reference pipeline bit-for-bit at
    both an all-ones table (q=100) and a genuinely lossy one (q=75) —
    this is the strong pin on Huffman coding, zigzag, DC prediction,
    byte stuffing, and quantization working together."""
    from skripsi_mapreduce_spark.operators.jpeg import _Q_CHROMA, _Q_LUMA, _scaled_qtable

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 40, 3), dtype=np.int64).astype(np.uint8)
    h, w = img.shape[:2]
    for q in (100, 75):
        blob = make_jpeg(w, h, img.tobytes(), quality=q)
        dw, dh, px = decode_jpeg(blob)
        ql = np.array(_scaled_qtable(_Q_LUMA, q), dtype=np.float64).reshape(8, 8)
        qc = np.array(_scaled_qtable(_Q_CHROMA, q), dtype=np.float64).reshape(8, 8)
        want = _reference_pipeline(img, ql, qc)
        assert (dw, dh) == (w, h)
        assert np.array_equal(px, want), f"q={q} max diff {np.abs(px.astype(int)-want.astype(int)).max()}"


def test_non_multiple_of_8_dimensions_and_grayscale():
    """Edge-padded encode + decoder crop recover the exact flat image at
    awkward sizes (including 4:2:0, whose MCU grid is 16x16)."""
    for size, kw in (((13, 21), {}), ((10, 18), {"subsampling": "420"}),
                     ((9, 9), {"grayscale": True})):
        h, w = size
        g = np.full((h, w), 200, dtype=np.uint8)
        img = np.stack([g, g, g], axis=2)
        blob = make_jpeg(w, h, img.tobytes(), quality=100, **kw)
        dw, dh, px = decode_jpeg(blob)
        assert (dw, dh) == (w, h)
        assert np.array_equal(px, img)


def test_restart_intervals_roundtrip():
    img = _flat_tile_grey(6, 4, seed=23)
    h, w = img.shape[:2]
    blob = make_jpeg(w, h, img.tobytes(), quality=100, restart_interval=2)
    assert b"\xff\xdd" in blob and b"\xff\xd0" in blob  # DRI + RST0 present
    dw, dh, px = decode_jpeg(blob)
    assert np.array_equal(px, img)


def test_unsupported_tiers_raise_loudly():
    img = _flat_tile_grey(2, 2)
    blob = bytearray(make_jpeg(16, 16, img.tobytes()))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"P6\n1 1\n255\nxxx")
    with pytest.raises(OSError):
        decode_jpeg(bytes(make_jpeg(16, 16, img.tobytes()))[:40])  # truncated


def test_annex_k_huffman_tables_are_canonical():
    """The four typical tables must build valid canonical codes with the
    declared counts (12 DC categories, 162 AC symbols covering every
    (run, size) pair plus EOB/ZRL)."""
    from skripsi_mapreduce_spark.operators.jpeg import (
        _AC_CHROMA_BITS, _AC_CHROMA_VALS, _AC_LUMA_BITS, _AC_LUMA_VALS,
        _DC_CHROMA_BITS, _DC_CHROMA_VALS, _DC_LUMA_BITS, _DC_LUMA_VALS,
    )

    for bits, vals, n in (
        (_DC_LUMA_BITS, _DC_LUMA_VALS, 12),
        (_DC_CHROMA_BITS, _DC_CHROMA_VALS, 12),
        (_AC_LUMA_BITS, _AC_LUMA_VALS, 162),
        (_AC_CHROMA_BITS, _AC_CHROMA_VALS, 162),
    ):
        assert len(vals) == len(set(vals)) == n
        dec, enc = _build_huffman(bits, vals)
        # decode side is the canonical (mincode, maxcode, valptr, vals)
        # triple; its value table must carry every symbol, and the
        # encode map must round-trip through it by code
        mincode, maxcode, valptr, dvals = dec
        assert len(dvals) == len(enc) == n
        for sym, (code, length) in enc.items():
            assert mincode[length] <= code <= maxcode[length]
            assert dvals[valptr[length] + code - mincode[length]] == sym
    want_ac = {0x00, 0xF0} | {
        (run << 4) | size for run in range(16) for size in range(1, 11)
    }
    assert set(_AC_LUMA_VALS) == want_ac
    assert set(_AC_CHROMA_VALS) == want_ac


def test_multimodal_dispatch_decodes_jpeg(spark):
    """JPEG blobs ride the SAME Spark plumbing as PPM/PNG: the
    mapInPandas feature path decodes them (decode_stub=False) and the
    dHash of a flat-tile JPEG equals the dHash of the pixel-identical
    PPM — cross-codec signature parity, so near-dup blocking treats a
    re-encoded image as the same content."""
    from skripsi_mapreduce_spark.operators.multimodal import (
        extract_image_features,
        image_dhash,
        make_ppm,
    )

    imgs = {i: _flat_tile_grey(9, 8, seed=i) for i in range(4)}
    rows = []
    for i, img in imgs.items():
        h, w = img.shape[:2]
        rows.append((i, "image", bytearray(make_jpeg(w, h, img.tobytes())), None))
        rows.append(
            (100 + i, "image", bytearray(make_ppm(w, h, img.tobytes())), None)
        )
    schema = (
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int,sample_rate:int>"
    )
    media = spark.createDataFrame(rows, schema)
    feats = {
        r["media_id"]: r
        for r in extract_image_features(media, decode_stub=False).collect()
    }
    for i, img in imgs.items():
        assert feats[i]["width"] == img.shape[1]
        assert feats[i]["height"] == img.shape[0]
        # pixel-identical decode -> identical features vs the PPM twin
        assert feats[i]["feature"] == feats[100 + i]["feature"]
        assert feats[i]["mean_luma"] == feats[100 + i]["mean_luma"]
    sig = {r["media_id"]: (r["sim_hi"], r["sim_lo"]) for r in image_dhash(media).collect()}
    for i in imgs:
        assert sig[i] == sig[100 + i]


_REAL_BASELINE = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/"
    "flower-of-life.jpg"
)
_REAL_PROGRESSIVE = "/usr/share/doc/nodejs/thin-white-stripe.jpg"


@pytest.mark.skipif(
    not __import__("os").path.exists(_REAL_BASELINE),
    reason="third-party sample JPEG not on this machine",
)
def test_decodes_real_third_party_baseline_jpeg():
    """Cross-ENCODER validation (the direction the Avro family could
    never test in-container): a baseline JPEG produced by a real
    production encoder — a doc asset shipped inside a third-party
    package on this image, not authored by this repo — must decode
    through the whole marker/Huffman/IDCT path. Asserts structural
    truths (dimensions from SOF0, full entropy-stream consumption
    without error, the known white background) rather than self-pinned
    pixels, so the test validates interop, not this codec against
    itself."""
    import numpy as np

    with open(_REAL_BASELINE, "rb") as fh:
        blob = fh.read()
    w, h, px = decode_jpeg(blob)
    assert (w, h) == (161, 161)
    assert px.shape == (161, 161, 3) and px.dtype == np.uint8
    # white background: corners saturate, global mean bright
    assert (px[0, 0] > 245).all() and (px[-1, -1] > 245).all()
    assert 180 < px.mean() < 255


@pytest.mark.skipif(
    not __import__("os").path.exists(_REAL_PROGRESSIVE),
    reason="third-party sample JPEG not on this machine",
)
def test_real_progressive_jpeg_gates_loudly():
    with open(_REAL_PROGRESSIVE, "rb") as fh:
        blob = fh.read()
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(blob)


def test_multi_scan_baseline_gates_loudly():
    """A legal T.81 baseline file may split components across scans
    (non-interleaved); this codec decodes one fully-interleaved scan
    only and must GATE, not silently return empty chroma (round-10
    ADVICE, medium). Rewrites a 3-component file's SOS to cover one
    component."""
    img = _flat_tile_grey(2, 2)
    blob = bytearray(make_jpeg(16, 16, img.tobytes()))
    sos = blob.find(b"\xff\xda")
    assert sos > 0
    # replace the 3-component SOS header with a 1-component (Y-only) one
    ln = int.from_bytes(blob[sos + 2 : sos + 4], "big")
    one_comp_sos = bytes.fromhex("ffda0008 01 0100 003f00".replace(" ", ""))
    patched = bytes(blob[:sos]) + one_comp_sos + bytes(blob[sos + 2 + ln :])
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(patched)


def test_single_component_subsampled_scan_gates_loudly():
    """A 1-component frame whose component declares 2x2 sampling uses
    the spec's NON-interleaved block order — different from this
    decoder's interleaved loop — so it must gate rather than decode
    blocks in the wrong order."""
    img = _flat_tile_grey(2, 2)
    blob = bytearray(make_jpeg(16, 16, img.tobytes(), grayscale=True))
    sof = blob.find(b"\xff\xc0")
    assert sof > 0 and blob[sof + 9] == 1  # ncomp == 1
    blob[sof + 11] = 0x22  # h=2, v=2
    with pytest.raises(NotImplementedError, match="single-component"):
        decode_jpeg(bytes(blob))


def test_rst_marker_preceded_by_fill_bytes_decodes():
    """0xFF fill bytes before an RSTn are legal padding (T.81 B.1.1.2):
    0xFF 0xFF 0xD0 is a valid restart (round-10 ADVICE, low)."""
    img = _flat_tile_grey(6, 4, seed=23)
    h, w = img.shape[:2]
    blob = make_jpeg(w, h, img.tobytes(), quality=100, restart_interval=2)
    i = blob.find(b"\xff\xd0")
    assert i > 0
    padded = blob[:i] + b"\xff" + blob[i:]
    dw, dh, px = decode_jpeg(padded)
    assert np.array_equal(px, img)


def test_lengthless_markers_before_sos_raise_named_errors():
    """EOI right after the header tail must report 'EOI before any scan
    data' (not a phantom truncation), and a stray RSTn/TEM before SOS
    must raise a named error instead of consuming garbage 'length'
    bytes and desyncing the parse (round-10 ADVICE, low)."""
    with pytest.raises(OSError, match="EOI before any scan"):
        decode_jpeg(b"\xff\xd8\xff\xd9")
    with pytest.raises(OSError, match="stray length-less marker 0xD3"):
        decode_jpeg(b"\xff\xd8\xff\xd3\x12\x34\x56\x78")
    with pytest.raises(OSError, match="stray length-less marker 0x01"):
        decode_jpeg(b"\xff\xd8\xff\x01\x12\x34\x56\x78")
    # a trailing 0xFF fill run with no marker byte must be a NAMED
    # truncation error, not an IndexError (round-11 review catch)
    with pytest.raises(OSError, match="truncated"):
        decode_jpeg(b"\xff\xd8\xff\xff")
    # SOS referencing a component id absent from SOF0: named OSError,
    # not a bare StopIteration (round-11 review catch)
    img = _flat_tile_grey(2, 2)
    blob = bytearray(make_jpeg(16, 16, img.tobytes(), grayscale=True))
    sos = blob.find(b"\xff\xda")
    blob[sos + 5] += 7  # component selector -> unknown id
    with pytest.raises(OSError, match="absent from SOF0"):
        decode_jpeg(bytes(blob))


def test_color_fixture_palette_is_tie_free_and_codec_exact():
    """The mm_image_decode color-JPEG lane draws its solid color from
    the palette (i, 3i+7, 11i+19) mod 256. For EVERY one of the 256
    palette triples this pins, exhaustively:

    1. no expression in the encode YCbCr round or the decode RGB
       reconstruction lands on an exact-representable .5 — the only
       place numpy's half-even and SQL ROUND's half-away-from-zero
       could diverge, so the DuckDB closed form is a theorem for this
       palette, not a sample;
    2. the REAL codec (make_jpeg q=100 4:2:0 -> decode_jpeg: YCbCr
       matrix, flat-block DCT, chroma box-subsample + upsample) decodes
       to exactly the closed-form triple, every pixel."""
    for i in range(256):
        r0, g0, b0 = i, (3 * i + 7) % 256, (11 * i + 19) % 256
        y = 0.299 * r0 + 0.587 * g0 + 0.114 * b0
        cb = 128.0 - 0.168736 * r0 - 0.331264 * g0 + 0.5 * b0
        cr = 128.0 + 0.5 * r0 - 0.418688 * g0 - 0.081312 * b0
        assert all((v % 1.0) != 0.5 for v in (y, cb, cr)), i
        yi, cbi, cri = (
            min(max(int(np.round(v)), 0), 255) for v in (y, cb, cr)
        )
        rd = yi + 1.402 * (cri - 128)
        gd = yi - 0.344136 * (cbi - 128) - 0.714136 * (cri - 128)
        bd = yi + 1.772 * (cbi - 128)
        assert all((v % 1.0) != 0.5 for v in (rd, gd, bd)), i
        want = tuple(min(max(int(np.round(v)), 0), 255) for v in (rd, gd, bd))
        blob = make_jpeg(
            16, 8, bytes([r0, g0, b0]) * 128, quality=100, subsampling="420"
        )
        w, h, px = decode_jpeg(blob)
        assert (w, h) == (16, 8) and tuple(px[0, 0]) == want, (i, want)
        assert (px == px[0, 0]).all(), i


def test_fuzzed_blobs_raise_only_named_errors():
    """Deterministic fuzz over mutated/truncated/spliced variants of
    four real encoder outputs (color q75, flat 4:2:0, restart-interval,
    grayscale): decode either succeeds or raises one of the module's
    SANCTIONED types — OSError / NotImplementedError / the 'not a JPEG'
    ValueError. Anything else (IndexError, StopIteration, struct.error,
    bare ValueError) is an anonymous task failure when it escapes the
    mapInPandas kernel; the round-11 fuzz pass found and fixed five
    such holes (fill-run tail, unknown SOS component, short DQT/DHT/
    SOF0/DRI/SOS segments)."""
    import random

    rng_np = np.random.RandomState(1)
    base_blobs = [
        make_jpeg(16, 16, bytes(rng_np.randint(0, 256, 16 * 16 * 3, dtype=np.uint8)), quality=75),
        make_jpeg(16, 8, bytes([10, 200, 30]) * 128, quality=100, subsampling="420"),
        make_jpeg(
            48, 32,
            bytes(rng_np.randint(0, 256, 48 * 32 * 3, dtype=np.uint8)),
            quality=75, restart_interval=2,
        ),
        make_jpeg(16, 16, bytes([99]) * (16 * 16 * 3), grayscale=True),
    ]
    rng = random.Random(42)
    for _ in range(1500):
        blob = bytearray(rng.choice(base_blobs))
        op = rng.randrange(4)
        if op == 0:
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        elif op == 1:
            blob = blob[: rng.randrange(2, len(blob))]
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
            decode_jpeg(bytes(blob))
        except (OSError, NotImplementedError):
            pass
        except ValueError as e:
            assert "not a JPEG" in str(e), f"unsanctioned ValueError: {e}"
