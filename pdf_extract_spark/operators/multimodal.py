"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels (build brief:
multimodal ops for a training-data pipeline; extends the reference's
binary-payload handling, /root/reference/modules/tools.py:42, to non-text
media).

Real codec decode (PIL/ffmpeg/librosa) is NOT available in this sandbox —
the decode step is STUBBED: payloads use a deterministic container format
(`MMK1` header + metadata + seeded fake samples) synthesized by
``make_media_payload``, and ``_decode_stub`` parses exactly that. The
Spark-side plumbing is real and tested: schemas, Arrow batch shapes,
size-salted partitioning, 1-row-in→N-rows-out frame explosion. Swapping
``_decode_stub`` for a real codec changes no plan shape.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id string, kind string, payload binary")

META_SCHEMA = (
    "media_id string, kind string, width int, height int, sample_rate int, "
    "n_frames int, n_bytes long, error string"
)

_MAGIC = b"MMK1"
_KINDS = {"image": 1, "audio": 2, "video": 3}
_KIND_NAMES = {v: k for k, v in _KINDS.items()}


def make_media_payload(media_id: str, kind: str, width: int = 0,
                       height: int = 0, sample_rate: int = 0,
                       n_frames: int = 1) -> bytes:
    """Deterministic fake container: header + seeded sample bytes. The
    sample region is a pure function of media_id so feature kernels are
    partition-invariant."""
    seed = sum(media_id.encode()) % 251
    header = _MAGIC + struct.pack(
        "<BIIII", _KINDS[kind], width, height, sample_rate, n_frames)
    n_samples = max(width * height, sample_rate, n_frames * 16, 16)
    samples = bytes(((seed + i * 31) % 256) for i in range(min(n_samples, 4096)))
    return header + samples


def _decode_stub(payload: bytes) -> tuple[dict | None, str | None]:
    """STUB decode (stands in for PIL.Image.open / av.open / soundfile):
    parses the deterministic MMK1 container. Unknown magic → quarantine,
    mirroring the extract pipeline's error taxonomy."""
    if payload is None or len(payload) < 21:
        return None, "empty_or_short_payload"
    if payload[:4] != _MAGIC:
        return None, "unknown_container"  # real codecs would dispatch here
    kind_b, width, height, rate, frames = struct.unpack("<BIIII", payload[4:21])
    kind = _KIND_NAMES.get(kind_b)
    if kind is None:
        return None, "unknown_kind"
    return {"kind": kind, "width": width, "height": height,
            "sample_rate": rate, "n_frames": frames,
            "samples": np.frombuffer(payload[21:], dtype=np.uint8)}, None


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in ("media_id", "kind", "width", "height",
                                "sample_rate", "n_frames", "n_bytes", "error")}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            raw = bytes(payload) if payload is not None else b""
            meta, err = _decode_stub(raw)
            rows["media_id"].append(mid)
            rows["kind"].append(meta["kind"] if meta else None)
            rows["width"].append(meta["width"] if meta else 0)
            rows["height"].append(meta["height"] if meta else 0)
            rows["sample_rate"].append(meta["sample_rate"] if meta else 0)
            rows["n_frames"].append(meta["n_frames"] if meta else 0)
            rows["n_bytes"].append(len(raw))
            rows["error"].append(err)
        yield pd.DataFrame(rows)


def decode_media(media: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """media(media_id, kind, payload) → typed metadata table. Same
    size-salted partitioning discipline as the text extract operator
    (operators/extract.py): oversized payloads round-robin, rest by id-hash."""
    from .extract import salted_repartition

    df = media.select("media_id", "payload")
    if num_partitions:
        df = salted_repartition(df, num_partitions, key="media_id")
    return df.mapInPandas(_meta_batches, schema=META_SCHEMA)


FEATURE_SCHEMA = "media_id string, feature array<float>, error string"


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """8-bin byte histogram of the sample region, L1-normalized — the
    deterministic stand-in for an image-embedding model; numpy-vectorized
    per Arrow batch (never per-pixel Python)."""
    for pdf in batches:
        ids, feats, errs = [], [], []
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            meta, err = _decode_stub(
                bytes(payload) if payload is not None else b"")
            ids.append(mid)
            if err:
                feats.append(None)
                errs.append(err)
                continue
            hist = np.bincount(meta["samples"] >> 5, minlength=8).astype("f8")
            total = hist.sum()
            feats.append((hist / total if total else hist).astype("f4").tolist())
            errs.append(None)
        yield pd.DataFrame({"media_id": ids, "feature": feats, "error": errs})


def media_features(media: DataFrame) -> DataFrame:
    """payload → fixed-dim feature vector (array<float>), ready for the
    vector search stack (vectors_q) — narrow op, no shuffle."""
    return media.select("media_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = ("media_id string, frame_idx int, frame_off long, "
                "frame_digest string")


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib
    for pdf in batches:
        rows = {k: [] for k in ("media_id", "frame_idx", "frame_off",
                                "frame_digest")}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            meta, err = _decode_stub(
                bytes(payload) if payload is not None else b"")
            if err or meta["kind"] != "video" or meta["n_frames"] <= 0:
                continue
            samples = meta["samples"]
            # the container caps the sample region (4096 bytes in the stub
            # format): never address frames past the real payload — they
            # would all hash the empty slice to one digest, collapsing dedup
            n_eff = min(meta["n_frames"], len(samples))
            stride = max(len(samples) // max(n_eff, 1), 1)
            # sample every 4th frame (uniform temporal sampling)
            for idx in range(0, n_eff, 4):
                off = idx * stride
                if off >= len(samples):
                    break
                chunk = samples[off:off + stride].tobytes()
                rows["media_id"].append(mid)
                rows["frame_idx"].append(idx)
                rows["frame_off"].append(off)
                rows["frame_digest"].append(
                    hashlib.sha256(chunk).hexdigest()[:16])
        yield pd.DataFrame(rows) if rows["media_id"] else pd.DataFrame(
            {k: pd.Series(rows[k], dtype=t) for k, t in
             [("media_id", "object"), ("frame_idx", "int64"),
              ("frame_off", "int64"), ("frame_digest", "object")]})


def sample_frames(media: DataFrame) -> DataFrame:
    """Video payload → one row per sampled frame (1-in→N-out mapInPandas,
    the UDTF shape) with per-frame digests for downstream dedup."""
    return media.select("media_id", "payload").mapInPandas(
        _frame_batches, schema=FRAME_SCHEMA)
