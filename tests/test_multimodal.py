"""Multimodal tests: real-container decode (BMP/PPM/WAV/Y4M from public
specs, fixtures/media.py writers), schema/metadata decode, feature
determinism under repartitioning, frame explosion, error taxonomy. The
MMK1 container remains the stand-in for compressed codecs."""

from __future__ import annotations

import pytest

from pdf_extract_spark.fixtures.media import (
    make_bmp,
    make_ppm,
    make_wav,
    make_y4m,
)
from pdf_extract_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    decode_payload_media,
    make_media_payload,
    media_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_sdf(spark):
    rows = []
    for i in range(40):
        kind = ["image", "audio", "video"][i % 3]
        payload = make_media_payload(
            f"m{i:04d}", kind,
            width=32 + i, height=16 + i, sample_rate=8000 + i,
            n_frames=12 + i)
        rows.append((f"m{i:04d}", kind, bytearray(payload)))
    rows.append(("bad01", "image",
                 bytearray(b"\x89PNG not our container format padding")))
    rows.append(("bad02", "image", bytearray(b"")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_metadata(media_sdf):
    out = {r["media_id"]: r for r in decode_media(media_sdf).collect()}
    assert len(out) == 42
    assert out["m0003"]["kind"] == "image"
    assert out["m0003"]["width"] == 35 and out["m0003"]["height"] == 19
    assert out["m0004"]["kind"] == "audio"
    assert out["m0004"]["sample_rate"] == 8004
    assert out["bad01"]["error"] == "unknown_container"
    assert out["bad02"]["error"] == "empty_or_short_payload"


def test_decode_partitioning_invariant(media_sdf):
    a = sorted(map(tuple, decode_media(media_sdf, num_partitions=2).collect()))
    b = sorted(map(tuple, decode_media(media_sdf, num_partitions=7).collect()))
    assert a == b


def test_features_shape_and_determinism(media_sdf):
    rows = {r["media_id"]: r for r in media_features(media_sdf).collect()}
    ok = [r for r in rows.values() if r["error"] is None]
    assert len(ok) == 40
    for r in ok:
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-5
    again = {r["media_id"]: r for r in
             media_features(media_sdf.repartition(5)).collect()}
    for mid, r in rows.items():
        assert again[mid]["feature"] == r["feature"]
    assert rows["bad01"]["feature"] is None


@pytest.fixture(scope="module")
def real_media_sdf(spark):
    rows = [
        ("bmp0", "image", bytearray(make_bmp(17, 9, seed=1))),
        ("bmp1", "image", bytearray(make_bmp(17, 9, seed=1, top_down=True))),
        ("ppm0", "image", bytearray(make_ppm(11, 7, seed=2))),
        ("ppm1", "image", bytearray(make_ppm(11, 7, seed=2,
                                             comment="net pbm fixture"))),
        ("wav0", "audio", bytearray(make_wav(16000, 480, seed=3))),
        ("wav1", "audio", bytearray(make_wav(44100, 256, seed=4,
                                             channels=2))),
        ("y4m0", "video", bytearray(make_y4m(16, 12, 13, seed=5))),
        # corruption taxonomy, one per real-format error branch
        ("cut_bmp", "image", bytearray(make_bmp(17, 9)[:100])),
        ("cut_ppm", "image", bytearray(make_ppm(11, 7)[:-4])),
        ("cut_wav", "audio", bytearray(make_wav(16000, 480)[:-3])),
        ("cut_y4m", "video", bytearray(make_y4m(16, 12, 3)[:-10])),
        # MP3 stays the representative undecodable compressed codec
        # (PNG and JPEG are decoded for real since round 5)
        ("mp3", "audio", bytearray(b"ID3\x04\x00\x00" + b"\x00" * 32)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_real_formats_decode_metadata(real_media_sdf):
    out = {r["media_id"]: r for r in decode_media(real_media_sdf).collect()}
    bmp = out["bmp0"]
    assert (bmp["kind"], bmp["width"], bmp["height"], bmp["n_frames"]) == \
        ("image", 17, 9, 1) and bmp["error"] is None
    ppm = out["ppm0"]
    assert (ppm["kind"], ppm["width"], ppm["height"]) == ("image", 11, 7)
    assert out["ppm1"]["width"] == 11  # header comment handled
    wav = out["wav0"]
    assert (wav["kind"], wav["sample_rate"], wav["n_frames"]) == \
        ("audio", 16000, 480)
    assert out["wav1"]["n_frames"] == 256  # stereo block align honored
    y4m = out["y4m0"]
    assert (y4m["kind"], y4m["width"], y4m["height"], y4m["n_frames"],
            y4m["sample_rate"]) == ("video", 16, 12, 13, 25)
    assert out["cut_bmp"]["error"] == "truncated_bmp_pixels"
    assert out["cut_ppm"]["error"] == "truncated_ppm_pixels"
    assert out["cut_wav"]["error"] == "truncated_wav_chunk"
    assert out["cut_y4m"]["error"] == "truncated_y4m_frame"
    assert out["mp3"]["error"] == "unknown_container"


def test_bmp_orientation_and_padding_invariance():
    """Bottom-up and top-down storage of the same image must yield
    identical top-down sample bytes (stride padding stripped)."""
    import numpy as np
    a, ea = decode_payload_media(make_bmp(17, 9, seed=1))
    b, eb = decode_payload_media(make_bmp(17, 9, seed=1, top_down=True))
    assert ea is None and eb is None
    assert np.array_equal(a["samples"], b["samples"])
    assert len(a["samples"]) == 17 * 9 * 3  # padding stripped


def test_real_format_features(real_media_sdf):
    rows = {r["media_id"]: r for r in
            media_features(real_media_sdf).collect()}
    for mid in ("bmp0", "ppm0", "wav0", "y4m0"):
        assert rows[mid]["error"] is None
        assert len(rows[mid]["feature"]) == 8
        assert abs(sum(rows[mid]["feature"]) - 1.0) < 1e-5
    # identical pixel content through different containers → same feature
    assert rows["bmp0"]["feature"] == rows["bmp1"]["feature"]
    assert rows["ppm0"]["feature"] == rows["ppm1"]["feature"]
    assert rows["cut_bmp"]["feature"] is None


def test_y4m_real_frame_sampling(real_media_sdf):
    """Y4M frame sampling must address TRUE frame boundaries: every 4th
    frame, offsets at multiples of the C420 frame size, digests distinct
    (per-frame content differs by construction)."""
    frames = [r for r in sample_frames(real_media_sdf).collect()
              if r["media_id"] == "y4m0"]
    frame_size = 16 * 12 * 3 // 2
    assert sorted(r["frame_idx"] for r in frames) == [0, 4, 8, 12]
    for r in frames:
        assert r["frame_off"] == r["frame_idx"] * frame_size
    assert len({r["frame_digest"] for r in frames}) == len(frames)


def test_frame_sampling_explodes_videos(media_sdf):
    frames = sample_frames(media_sdf).collect()
    vids = {r["media_id"] for r in frames}
    assert vids and all(m.startswith("m") for m in vids)
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["media_id"], []).append(r)
    # m0002 is video with n_frames=14 → sampled at stride 4 → 4 frames
    assert len(by_vid["m0002"]) == 4
    idxs = sorted(r["frame_idx"] for r in by_vid["m0002"])
    assert idxs == [0, 4, 8, 12]
    # digests deterministic
    again = {(r["media_id"], r["frame_idx"]): r["frame_digest"]
             for r in sample_frames(media_sdf.repartition(3)).collect()}
    for r in frames:
        assert again[(r["media_id"], r["frame_idx"])] == r["frame_digest"]


# ---------------------------------------------------------------- PNG

def test_png_roundtrip_all_color_types_and_filters():
    """Pixel-exact inflate + unfilter for every supported color type
    (gray/RGB/palette/gray+alpha/RGBA) under every scanline filter,
    including mixed per-row cycling — palette indices expand through
    PLTE so samples are layout-independent raw channel bytes."""
    import numpy as np

    from pdf_extract_spark.fixtures.media import (
        make_png, png_expected_samples)
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    for ct in (0, 2, 3, 4, 6):
        for filters in [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)]:
            p = make_png(9, 6, seed=ct * 31 + filters[0],
                         color_type=ct, filters=filters)
            meta, err = decode_payload_media(p)
            assert err is None, (ct, filters, err)
            assert (meta["kind"], meta["width"], meta["height"],
                    meta["n_frames"]) == ("image", 9, 6, 1)
            exp = png_expected_samples(9, 6, seed=ct * 31 + filters[0],
                                       color_type=ct)
            assert np.array_equal(meta["samples"], exp), (ct, filters)


def test_png_quarantine_taxonomy():
    """Each malformed-stream class lands in its typed quarantine reason
    instead of raising — the extract pipeline's error discipline."""
    import struct
    import zlib

    from pdf_extract_spark.fixtures.media import make_png
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr22 = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))

    good = make_png(5, 4, seed=3)
    flipped = bytearray(good)
    flipped[41] ^= 0xFF  # first IDAT data byte
    cases = {
        bytes(flipped): "bad_png_crc",
        good[:40]: "truncated_png_chunk",
        # interlace values beyond Adam7 (which decodes for real now)
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 2))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b""): "unsupported_png_interlace",
        sig + ihdr22 + chunk(b"IDAT", b"junk") + chunk(b"IEND", b""):
            "bad_png_zlib",
        sig + ihdr22 + chunk(b"IDAT", zlib.compress(b"\x00\x01"))
            + chunk(b"IEND", b""): "truncated_png_pixels",
        sig + ihdr22 + chunk(b"IDAT", zlib.compress(
            b"\x07\x01\x02\x07\x03\x04")) + chunk(b"IEND", b""):
            "bad_png_filter",
        sig + ihdr22 + chunk(b"IEND", b""): "missing_png_idat",
        # sub-byte depths stay out of scope (depth 16 decodes for real)
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b""): "unsupported_png_depth",
        # palette images must be depth <= 8 per spec
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b""): "bad_png_ihdr",
        sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 7, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b""): "unsupported_png_color",
    }
    for payload, want in cases.items():
        meta, err = decode_payload_media(payload)
        assert meta is None and err == want, (want, err)


def test_png_through_spark_decode(spark):
    """PNG payloads flow through the same Arrow-batched decode_media /
    media_features operators as every other container, partition-
    invariantly."""
    from pdf_extract_spark.fixtures.media import make_png
    from pdf_extract_spark.operators.multimodal import (
        decode_media, media_features)

    rows = [("png0", bytearray(make_png(8, 5, seed=1, color_type=6))),
            ("png1", bytearray(make_png(3, 3, seed=2, color_type=3))),
            ("bad0", bytearray(make_png(4, 4, seed=3)[:30]))]
    sdf = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["media_id"]: r for r in decode_media(sdf).collect()}
    assert (out["png0"]["kind"], out["png0"]["width"],
            out["png0"]["height"]) == ("image", 8, 5)
    assert out["png1"]["kind"] == "image"
    assert out["bad0"]["error"] == "truncated_png_chunk"
    feats = {r["media_id"]: r for r in media_features(sdf).collect()}
    assert len(feats["png0"]["feature"]) == 8
    assert feats["bad0"]["feature"] is None
    a = sorted(map(tuple, decode_media(sdf, num_partitions=2).collect()))
    b = sorted(map(tuple, decode_media(sdf, num_partitions=3).collect()))
    assert a == b

# ---------------------------------------------------------------- JPEG

def test_jpeg_constant_images_reconstruct_exactly():
    """With all-ones quant tables a constant image is DC-only and the
    FDCT→quantize→Huffman→decode→IDCT loop reproduces every sample byte
    exactly, in all three layouts (gray, YCbCr 4:4:4, YCbCr 4:2:0 with
    non-multiple-of-16 dims) — the arithmetic premise of the
    media_*_jpeg oracles."""
    import numpy as np

    from pdf_extract_spark.fixtures.media import make_jpeg
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    for v in (20, 77, 128, 219):
        for kwargs, nch in ((dict(gray=True), 1),
                            (dict(subsampling="444"), 3),
                            (dict(subsampling="420"), 3)):
            meta, err = decode_payload_media(make_jpeg(11, 5, value=v,
                                                       **kwargs))
            assert err is None, (v, kwargs, err)
            assert (meta["kind"], meta["width"], meta["height"],
                    meta["n_frames"]) == ("image", 11, 5, 1)
            assert meta["samples"].shape == (11 * 5 * nch,)
            assert (meta["samples"] == v).all(), (v, kwargs)


def test_jpeg_pattern_roundtrip_bounds():
    """Arbitrary-content round trips: near-lossless with unit quant
    tables (max error 1 from DCT float rounding), bounded with the
    Annex K example tables (quantization error only — no structural
    drift), both through restart-marker streams."""
    import numpy as np

    from pdf_extract_spark.fixtures.media import _pattern, make_jpeg
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    px = _pattern(40 * 24, 5).reshape(24, 40)
    for ri in (0, 1, 3):
        meta, err = decode_payload_media(
            make_jpeg(40, 24, gray=True, pixels=px, restart_interval=ri))
        assert err is None, (ri, err)
        got = meta["samples"].reshape(24, 40).astype(int)
        assert np.abs(got - px.astype(int)).max() <= 1, ri

    # Annex K tables quantize high frequencies coarsely (LCG noise would
    # legitimately lose ~27 mean abs), so the lossy-path assertion uses a
    # smooth gradient, where quantization error must stay within a few
    # code values — scrambled plane assembly or zigzag would blow it up
    y, x = np.mgrid[0:24, 0:32]
    ramp = (40 + y * 2 + x * 3).astype(np.float64)
    rgb = np.stack([ramp, ramp + 20, ramp + 40], axis=-1).astype(np.uint8)
    for sub in ("444", "420"):
        meta, err = decode_payload_media(
            make_jpeg(32, 24, pixels=rgb, subsampling=sub,
                      quality_tables=True))
        assert err is None, (sub, err)
        got = meta["samples"].reshape(24, 32, 3).astype(int)
        diff = np.abs(got - rgb.astype(int))
        assert diff.max() <= 6 and diff.mean() < 3.0, \
            (sub, diff.mean(), diff.max())


def test_jpeg_quarantine_taxonomy():
    """Typed quarantine for every unsupported/malformed class — the
    extract pipeline's error discipline, never an exception."""
    import struct

    from pdf_extract_spark.fixtures.media import make_jpeg
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    base = make_jpeg(16, 16, gray=True, value=50)
    sof = base.find(b"\xff\xc0")
    sos = base.find(b"\xff\xda")
    slen = struct.unpack_from(">H", base, sos + 2)[0]

    def patched(off, val):
        b = bytearray(base)
        b[off] = val
        return bytes(b)

    # strip every DHT segment → the scan references missing tables
    no_dht, pos = bytearray(base[:2]), 2
    while pos < len(base):
        m = base[pos + 1]
        if m == 0xDA:
            no_dht += base[pos:]
            break
        ln = struct.unpack_from(">H", base, pos + 2)[0]
        if m != 0xC4:
            no_dht += base[pos:pos + 2 + ln]
        pos += 2 + ln

    cases = {
        patched(sof + 1, 0xC2): "unsupported_jpeg_progressive",
        patched(sof + 1, 0xC9): "unsupported_jpeg_codec",
        patched(sof + 4, 12): "unsupported_jpeg_precision",
        base[:len(base) // 3]: "truncated_jpeg",
        base[:sos + 14]: "truncated_jpeg_scan",
        bytes(no_dht): "missing_jpeg_table",
        b"\xff\xd8\xff\xd9" + b"\x00" * 10: "missing_jpeg_scan",
        b"\xff\xd8" + b"\x00" * 20: "bad_jpeg_marker",
    }
    for payload, want in cases.items():
        meta, err = decode_payload_media(payload)
        assert meta is None and err == want, (want, err)

    # corrupt scan bytes: garbage pixels are acceptable, exceptions and
    # silent misdecodes of the ERROR field are not
    scan0 = sos + 2 + slen
    for off in range(scan0, min(scan0 + 8, len(base) - 2)):
        b = bytearray(base)
        b[off] ^= 0x5A
        meta, err = decode_payload_media(bytes(b))
        assert (meta is None) == (err is not None)
        if err is not None:
            assert err in ("bad_jpeg_huffman", "truncated_jpeg_scan",
                           "bad_jpeg_coef_index"), err


def test_jpeg_through_spark_decode(spark):
    """JPEG payloads flow through the same Arrow-batched decode_media /
    media_features operators as every other container, partition-
    invariantly, alongside the other formats in one batch."""
    from pdf_extract_spark.fixtures.media import make_jpeg, make_png
    from pdf_extract_spark.operators.multimodal import (
        decode_media, media_features)

    rows = [("j444", bytearray(make_jpeg(9, 6, value=100))),
            ("j420", bytearray(make_jpeg(10, 8, value=40,
                                         subsampling="420"))),
            ("jgray", bytearray(make_jpeg(7, 7, gray=True, value=200))),
            ("png0", bytearray(make_png(8, 5, seed=1))),
            ("jbad", bytearray(make_jpeg(4, 4, gray=True, value=9)[:20]))]
    sdf = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["media_id"]: r for r in decode_media(sdf).collect()}
    for mid, w, h in (("j444", 9, 6), ("j420", 10, 8), ("jgray", 7, 7)):
        assert (out[mid]["kind"], out[mid]["width"],
                out[mid]["height"]) == ("image", w, h), mid
    assert out["jbad"]["error"] == "truncated_jpeg"
    feats = {r["media_id"]: r for r in media_features(sdf).collect()}
    # constant value v → all histogram mass in bin v >> 5
    assert feats["j444"]["feature"][100 >> 5] == 1.0
    assert feats["jgray"]["feature"][200 >> 5] == 1.0
    assert feats["jbad"]["feature"] is None
    a = sorted(map(tuple, decode_media(sdf, num_partitions=2).collect()))
    b = sorted(map(tuple, decode_media(sdf, num_partitions=3).collect()))
    assert a == b

# ---------------------------------------------------------------- GIF

def test_gif_lzw_roundtrip_and_interlace():
    """Pixel-exact LZW round trips across palette sizes, including the
    12-bit-code / table-full / mid-stream-Clear regime (the encoder's
    width bump must track the decoder's lagged table — the classic GIF
    desync bug), plus 4-pass interlace reorder and GIF87a."""
    import numpy as np

    from pdf_extract_spark.fixtures.media import (
        gif_expected_samples, make_gif)
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    for (w, h), ps in (((9, 6), 16), ((33, 21), 7), ((5, 4), 4),
                       ((200, 150), 256)):  # last forces table fill+Clear
        meta, err = decode_payload_media(make_gif(w, h, seed=3,
                                                  palette_size=ps))
        assert err is None, ((w, h), ps, err)
        assert (meta["kind"], meta["width"], meta["height"],
                meta["n_frames"]) == ("image", w, h, 1)
        assert np.array_equal(
            meta["samples"], gif_expected_samples(w, h, seed=3,
                                                  palette_size=ps))
    meta, err = decode_payload_media(make_gif(12, 17, seed=5,
                                              interlace=True))
    assert err is None
    assert np.array_equal(meta["samples"],
                          gif_expected_samples(12, 17, seed=5))
    meta, err = decode_payload_media(make_gif(4, 4, seed=2,
                                              version=b"87a"))
    assert err is None and meta["kind"] == "image"
    meta, err = decode_payload_media(make_gif(8, 8, value=99))
    assert err is None and (meta["samples"] == 99).all()


def test_gif_animation_true_frame_bounds():
    """Multi-frame GIFs decode as video-kind rows with TRUE per-frame
    boundaries and the GCE-delay frame rate, so animated GIFs flow
    through the same sample_frames machinery as Y4M."""
    import numpy as np

    from pdf_extract_spark.fixtures.media import (
        gif_expected_samples, make_gif)
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    meta, err = decode_payload_media(make_gif(10, 7, n_frames=5, seed=2,
                                              delay_cs=5))
    assert err is None
    assert (meta["kind"], meta["n_frames"], meta["sample_rate"]) == \
        ("video", 5, 20)
    assert meta["frame_bounds"] == [(i * 210, 210) for i in range(5)]
    assert np.array_equal(meta["samples"],
                          gif_expected_samples(10, 7, n_frames=5, seed=2))


def test_gif_quarantine_taxonomy():
    """Typed quarantine for each malformed-stream class."""
    import struct

    from pdf_extract_spark.fixtures.media import _gif_lzw_encode, make_gif
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    base = make_gif(9, 6, seed=1)
    hdr = base[:13 + 48]  # LSD + 16-entry GCT
    corrupt = bytearray(base)
    corrupt[-10] ^= 0xFF

    lsd_nogct = b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0, 0, 0])
    img = (b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
           + bytes([2]))
    data = _gif_lzw_encode(bytes([0, 1, 1, 0]), 2)
    sub = bytes([len(data)]) + data + b"\x00"

    lsd_small = (b"GIF89a" + struct.pack("<HH", 2, 2)
                 + bytes([0x80 | 1, 0, 0]) + bytes(12))
    img3 = (b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
            + bytes([3]))
    data3 = _gif_lzw_encode(bytes([5, 5, 5, 5]), 3)
    sub3 = bytes([len(data3)]) + data3 + b"\x00"

    cases = {
        base[:len(base) // 2]: "truncated_gif",
        bytes(corrupt): "bad_gif_lzw",
        hdr + b"\x3b": "missing_gif_frame",
        hdr + b"\x7f\x3b": "bad_gif_block",
        lsd_nogct + img + sub + b"\x3b": "missing_gif_palette",
        lsd_small + img3 + sub3 + b"\x3b": "bad_gif_palette_index",
    }
    for payload, want in cases.items():
        meta, err = decode_payload_media(payload)
        assert meta is None and err == want, (want, err)


def test_gif_through_spark_frame_sampling(spark):
    """Animated GIF payloads explode through the SAME sample_frames
    operator as Y4M — every 4th frame at true byte offsets — and the
    static/corrupt rows drop out."""
    from pdf_extract_spark.fixtures.media import make_gif
    from pdf_extract_spark.operators.multimodal import (
        decode_media, sample_frames)

    anim = make_gif(6, 5, n_frames=9, seed=4)
    rows = [("anim", bytearray(anim)),
            ("still", bytearray(make_gif(6, 5, seed=7))),
            ("bad", bytearray(anim[:40]))]
    sdf = spark.createDataFrame(rows, "media_id string, payload binary")
    meta = {r["media_id"]: r for r in decode_media(sdf).collect()}
    assert (meta["anim"]["kind"], meta["anim"]["n_frames"]) == ("video", 9)
    assert meta["still"]["kind"] == "image"
    assert meta["bad"]["error"] == "truncated_gif"
    got = sorted((r["media_id"], r["frame_idx"], r["frame_off"])
                 for r in sample_frames(sdf).collect())
    fsz = 6 * 5 * 3
    assert got == [("anim", 0, 0), ("anim", 4, 4 * fsz), ("anim", 8, 8 * fsz)]

# ---------------------------------------------------------------- WAV codecs

def test_wav_g711_codeword_identity_exhaustive():
    """G.711 compressor/expander pair is exact over the ENTIRE codeword
    space: encode(decode(c)) == c for all 256 A-law codes and all μ-law
    codes except 0x7F — the spec's negative zero, which decodes to 0 and
    re-encodes to the canonical positive zero 0xFF."""
    import numpy as np

    from pdf_extract_spark.fixtures.media import (
        g711_alaw_encode, g711_ulaw_encode)
    from pdf_extract_spark.operators.multimodal import (
        g711_alaw_decode, g711_ulaw_decode)

    codes = np.arange(256, dtype=np.uint8)
    assert (g711_alaw_encode(g711_alaw_decode(codes)) == codes).all()
    u = g711_ulaw_encode(g711_ulaw_decode(codes))
    mism = np.nonzero(u != codes)[0]
    assert list(mism) == [0x7F] and u[0x7F] == 0xFF
    # published extremes: μ-law ±32124, A-law ±32256
    assert g711_ulaw_decode(np.array([0x00, 0x80], np.uint8)).tolist() == \
        [-32124, 32124]
    assert g711_alaw_decode(np.array([0x2A, 0xAA], np.uint8)).tolist() == \
        [-32256, 32256]


def test_wav_float_and_g711_decode_to_canonical_pcm16():
    """Float32 and G.711 WAV payloads decode to canonical little-endian
    PCM16 sample bytes: the same waveform shipped as float32 lands on
    the exact PCM16 bytes, and G.711 containers expand their codewords
    through the table formulas."""
    import struct as st

    import numpy as np

    from pdf_extract_spark.fixtures.media import _pattern, make_wav
    from pdf_extract_spark.operators.multimodal import (
        decode_payload_media, g711_ulaw_decode)

    for codec in ("float", "ulaw", "alaw"):
        meta, err = decode_payload_media(make_wav(8000, 64, seed=5,
                                                  codec=codec))
        assert err is None, (codec, err)
        assert (meta["kind"], meta["sample_rate"], meta["n_frames"]) == \
            ("audio", 8000, 64)
        assert len(meta["samples"]) == 64 * 2  # canonical PCM16 bytes

    # exact float → PCM16: encode known int16 values as float32/32767
    pcm = ((np.arange(64) * 97 % 2001) - 1000).astype(np.int16)
    body = (pcm.astype(np.float64) / 32767.0).astype("<f4").tobytes()
    fmt = st.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wav = (b"RIFF" + st.pack("<I", 20 + len(fmt) + len(body)) + b"WAVE"
           + b"fmt " + st.pack("<I", len(fmt)) + fmt
           + b"data" + st.pack("<I", len(body)) + body)
    meta, err = decode_payload_media(wav)
    assert err is None
    got = np.frombuffer(meta["samples"].tobytes(), "<i2")
    assert np.array_equal(got, pcm)

    # μ-law container: samples must equal the table expansion of the codes
    meta, err = decode_payload_media(make_wav(8000, 50, seed=9,
                                              codec="ulaw"))
    exp = g711_ulaw_decode(_pattern(50, 9)).astype("<i2")
    assert np.array_equal(np.frombuffer(meta["samples"].tobytes(), "<i2"),
                          exp)

    # unsupported stays typed: 24-bit float claim
    bad_fmt = st.pack("<HHIIHH", 3, 1, 8000, 32000, 3, 24)
    wav = (b"RIFF" + st.pack("<I", 20 + len(bad_fmt)) + b"WAVE"
           + b"fmt " + st.pack("<I", len(bad_fmt)) + bad_fmt
           + b"data" + st.pack("<I", 0))
    assert decode_payload_media(wav)[1] == "unsupported_wav_layout"

def test_png_adam7_and_depth16_roundtrip():
    """Adam7 interlace (seven independently-filtered reduced images,
    scattered back with strided assignment) and 16-bit depth (filters on
    2-byte units, high-byte canonical reduction) decode pixel-exactly —
    including canvases smaller than one 8×8 interlace tile, where later
    passes are empty."""
    import numpy as np

    from pdf_extract_spark.fixtures.media import (
        make_png, png_expected_samples)
    from pdf_extract_spark.operators.multimodal import decode_payload_media

    for ct in (0, 2, 3, 4, 6):
        for (w, h) in ((9, 6), (3, 2), (1, 1), (16, 16), (5, 11)):
            p = make_png(w, h, seed=ct * 13 + w, color_type=ct, interlace=1)
            meta, err = decode_payload_media(p)
            assert err is None, (ct, w, h, err)
            assert np.array_equal(
                meta["samples"],
                png_expected_samples(w, h, seed=ct * 13 + w, color_type=ct))
    for ct in (0, 2, 4, 6):
        for il in (0, 1):
            p = make_png(7, 5, seed=ct + il * 31, color_type=ct,
                         depth=16, interlace=il)
            meta, err = decode_payload_media(p)
            assert err is None, (ct, il, err)
            assert np.array_equal(
                meta["samples"],
                png_expected_samples(7, 5, seed=ct + il * 31,
                                     color_type=ct, depth=16))
