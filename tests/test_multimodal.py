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
        ("png", "image", bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)),
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
    assert out["png"]["error"] == "unknown_container"


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
