"""Multimodal plumbing tests: schema/metadata decode, feature determinism
under repartitioning, frame explosion, error taxonomy. Decode itself is a
documented stub (operators/multimodal.py) — the Spark plumbing is real."""

from __future__ import annotations

import pytest

from pdf_extract_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
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
