"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as Arrow ``binary`` columns with a
``media_type`` and a metadata map; decode / feature-extraction / resize /
frame-sampling are actor-pool map_batches stages. The decode kernels
themselves are STUBBED (no image/audio libraries in this container): each
stage either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the payload bytes (test mode) — the
Ray-side plumbing (schema, batch sizing, actor signature, output layout)
is real and tested.

Scale notes: binary rows are wide — callers should set small ``batch_size``
(64-256) and a larger ``target_max_block_size`` so Ray Data doesn't split
blocks absurdly small; payloads stay zero-copy Arrow buffers end to end.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("doc_id", pa.string()),
    ("media_type", pa.string()),          # image/png, audio/wav, video/mp4…
    ("payload", pa.binary()),
    ("meta", pa.map_(pa.string(), pa.string())),
])

FEATURE_DIM = 32


def synthesize_media_table(docs: pa.Table, payload_bytes: int = 2048) -> pa.Table:
    """Deterministic fake media rows derived from a documents table's image
    spans — stands in for real fetched bytes in tests/benchmarks."""
    rows = []
    for r in docs.select(["doc_id", "spans"]).to_pylist():
        for s in r["spans"] or []:
            if s["kind"] != "image":
                continue
            src = s["media_ref"]
            seed = zlib.crc32(src.encode())
            rng = np.random.RandomState(seed & 0x7FFFFFFF)
            payload = rng.bytes(payload_bytes)
            rows.append({
                "media_id": hashlib.sha1(src.encode()).hexdigest(),
                "doc_id": r["doc_id"],
                "media_type": ("image/png" if src.endswith(".png")
                               else "image/jpeg"),
                "payload": payload,
                "meta": [("src", src), ("alt", s["text"])],
            })
    if not rows:
        return MEDIA_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class ImageDecoder:
    """Actor-pool stage: payload → (width, height, pixels_hash).

    Real implementation would hold a decoder (PIL/libvips) loaded once in
    __init__. strict=True raises NotImplementedError at the decode point;
    fake mode derives deterministic dimensions from the payload bytes."""

    def __init__(self, strict: bool = False, decode_fn=None):
        # decode_fn: payload-bytes -> (width, height, pixels_hash); the
        # injection point for a real decoder (PIL/libvips), constructed
        # once per actor
        self.strict = strict
        self.decode_fn = decode_fn

    def _decode(self, payload: bytes) -> tuple[int, int, str]:
        if self.decode_fn is not None:
            return self.decode_fn(payload)
        if self.strict:
            raise NotImplementedError(
                "image decode requires PIL/libvips, not present in this "
                "environment — plug a real decoder here")
        h = zlib.crc32(payload)
        return 64 + h % 1024, 64 + (h >> 10) % 1024, \
            hashlib.md5(payload).hexdigest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        dims = [self._decode(p) for p in batch.column("payload").to_pylist()]
        return (batch
                .append_column("width", pa.array([d[0] for d in dims],
                                                 pa.int32()))
                .append_column("height", pa.array([d[1] for d in dims],
                                                  pa.int32()))
                .append_column("pixels_hash", pa.array([d[2] for d in dims],
                                                       pa.string())))


class ImageFeaturizer:
    """Actor-pool stage: payload → embedding (list<float32>, FEATURE_DIM).

    Real implementation loads a vision model once per actor in __init__ and
    runs batched inference in __call__; the stub derives a deterministic
    unit vector from payload bytes so downstream similarity plumbing is
    exercised end to end."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "feature extraction requires a vision model — plug one in "
                "here (loaded once per actor)")
        feats = []
        for p in batch.column("payload").to_pylist():
            seed = zlib.crc32(p) & 0x7FFFFFFF
            v = np.random.RandomState(seed).randn(FEATURE_DIM)
            v = v / (np.linalg.norm(v) or 1.0)
            feats.append(v.astype(np.float32).tolist())
        return batch.append_column(
            "embedding", pa.array(feats, pa.list_(pa.float32())))


class FrameSampler:
    """Actor-pool stage for video rows: emit ≤ ``max_frames`` frame rows per
    video (flat-map shape: output row count ≠ input row count). Frame
    extraction is stubbed with payload slices."""

    def __init__(self, max_frames: int = 4, strict: bool = False):
        self.max_frames = max_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("frame sampling requires ffmpeg")
        out = []
        for r in batch.to_pylist():
            payload = r["payload"]
            n = min(self.max_frames, max(1, len(payload) // 512))
            for i in range(n):
                out.append({
                    "media_id": r["media_id"],
                    "doc_id": r["doc_id"],
                    "frame_index": i,
                    "frame_payload": payload[i * 512:(i + 1) * 512],
                })
        schema = pa.schema([("media_id", pa.string()),
                            ("doc_id", pa.string()),
                            ("frame_index", pa.int32()),
                            ("frame_payload", pa.binary())])
        if not out:
            return schema.empty_table()
        return pa.Table.from_pylist(out, schema=schema)


def decode_pipeline(media_ds, concurrency: int = 2, batch_size: int = 64):
    """media table → decoded + featurized (the standard actor-pool wiring:
    small batches for wide binary rows, setup-once actors)."""
    return (media_ds
            .map_batches(ImageDecoder, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=concurrency)
            .map_batches(ImageFeaturizer, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=concurrency))
