"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference ships real decoders (CLIP/SigLIP image embedding,
/root/reference/rust/src/embeddings/local/clip.rs; Whisper audio,
/root/reference/rust/src/lib.rs:587-607; video frame sampling,
/root/reference/rust/src/lib.rs:546-550 emits video_path/frame_index
metadata).  The decode libraries are not available in this container, so
the DECODE step is stubbed (deterministic fake, clearly marked), while
all the Ray-side plumbing is real and tested: typed schemas, actor-pool
map_batches signature (heavy model state in __init__, per-batch work in
__call__), binary-payload-aware batch sizing, and exploded frame output
layout.

Swap `_decode_image_stub` for a real PIL/torchvision call and the
pipeline is production-shaped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

# bump when synth_assets or the asset schema changes: the /tmp cache
# filename folds this in so stale parquet is never reused across rounds
# (same bug class INDEX_FORMAT_VERSION guards against)
ASSET_FORMAT_VERSION = 1

# typed schema for a multimodal asset table: opaque payload + metadata
ASSETS = pa.schema([
    ("asset_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.binary()),        # encoded bytes (opaque)
    ("mime", pa.string()),
    ("width", pa.int32()),           # -1 when unknown/not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_assets(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake asset table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng([seed, 31337])
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "asset_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.tolist(), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["application/octet-stream"] * n),
        "width": pa.array(np.where(kinds == "image", 64, -1).astype(np.int32)),
        "height": pa.array(np.where(kinds == "image", 64, -1).astype(np.int32)),
        "duration_ms": pa.array(np.where(kinds != "image", 1000, -1).astype(np.int32)),
    })


def _decode_image_stub(payload: bytes, out_size: int) -> np.ndarray:
    """STUB: a real implementation calls PIL.Image.open + resize.
    Deterministic fake: payload bytes tiled into (out_size, out_size, 3).
    Raises like a real decoder would on empty payloads."""
    if not payload:
        raise NotImplementedError("empty payload — real decoder unavailable "
                                  "in this environment")
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = out_size * out_size * 3
    return np.resize(arr, need).reshape(out_size, out_size, 3)


class ImageFeatureActor:
    """Actor-pool stage: decode + resize + feature-extract image payloads.

    Mirrors the reference's heavy-init/per-batch-work split
    (/root/reference/rust/src/embeddings/local/clip.rs model load in the
    constructor): the 'model' (here a fixed projection matrix) is built
    ONCE per actor in __init__, each __call__ handles one Arrow batch.

    Use:  assets.map_batches(ImageFeatureActor, batch_format="pyarrow",
                             batch_size=64, concurrency=4, num_cpus=1)
    Small batch_size on purpose: payloads are large binaries.
    """

    OUT_SIZE = 32
    FEAT_DIM = 16

    def __init__(self, seed: int = 7):
        rng = np.random.default_rng(seed)
        self._proj = rng.standard_normal(
            (self.OUT_SIZE * self.OUT_SIZE * 3, self.FEAT_DIM))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        for payload in batch.column("payload").to_pylist():
            try:
                img = _decode_image_stub(payload, self.OUT_SIZE)
                feats.append((img.reshape(-1).astype(np.float64) / 255.0
                              ) @ self._proj)
                ok.append(True)
            except NotImplementedError:
                feats.append(np.zeros(self.FEAT_DIM))
                ok.append(False)   # error column, not a silent drop
        return pa.table({
            "asset_id": batch.column("asset_id"),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float64())),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


class FrameSampleActor:
    """Actor-pool stage: explode video payloads into sampled frame rows
    (the reference's frame_index metadata layout,
    /root/reference/rust/src/lib.rs:546-550).  Decode is stubbed; the
    row-explosion layout (one output row per sampled frame) is real."""

    def __init__(self, every_ms: int = 250):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, ts = [], [], []
        for aid, dur in zip(batch.column("asset_id").to_pylist(),
                            batch.column("duration_ms").to_pylist()):
            if dur <= 0:
                continue
            for i, t in enumerate(range(0, dur, self.every_ms)):
                ids.append(aid); frames.append(i); ts.append(t)
        return pa.table({
            "asset_id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(frames, pa.int32()),
            "ts_ms": pa.array(ts, pa.int32()),
        })


class AudioSegmentActor:
    """Actor-pool stage: explode audio payloads into transcribed SEGMENT
    rows with the reference's audio metadata layout — start/end seconds
    + per-segment text (/root/reference/rust/src/embeddings/mod.rs:40-52
    attaches start/end/file_name/text; the Whisper decoder loads per
    process, /root/reference/rust/src/lib.rs:587-607).

    Whisper weights don't exist in this container, so the TRANSCRIBE
    step is a clearly-marked deterministic stub (payload-derived token
    text per fixed-length window); everything Ray-side is real: heavy
    init slot in __init__, per-batch __call__, one output row per
    segment, decode_ok error column.  A real ASR model replaces
    ``_transcribe_stub`` only.
    """

    SEGMENT_MS = 400

    def __init__(self, seed: int = 13):
        # the "decoder weights" slot: a seeded token table stands in
        rng = np.random.default_rng(seed)
        self._tokens = [f"tok{int(x)}" for x in rng.integers(0, 999, 256)]

    def _transcribe_stub(self, payload: bytes, start_ms: int) -> str:
        if not payload:
            raise NotImplementedError("empty payload — real ASR "
                                      "unavailable in this environment")
        i = (payload[start_ms % len(payload)]
             + payload[(start_ms // 7) % len(payload)]) % len(self._tokens)
        return f"{self._tokens[i]} {self._tokens[(i * 31) % len(self._tokens)]}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, segs, starts, ends, texts, ok = [], [], [], [], [], []
        for aid, kind, dur, payload in zip(
                batch.column("asset_id").to_pylist(),
                batch.column("kind").to_pylist(),
                batch.column("duration_ms").to_pylist(),
                batch.column("payload").to_pylist()):
            if kind != "audio" or dur <= 0:
                continue
            for i, t in enumerate(range(0, dur, self.SEGMENT_MS)):
                end = min(t + self.SEGMENT_MS, dur)
                try:
                    txt, good = self._transcribe_stub(payload, t), True
                except NotImplementedError:
                    txt, good = "", False
                ids.append(aid); segs.append(i)
                starts.append(t / 1000.0); ends.append(end / 1000.0)
                texts.append(txt); ok.append(good)
        return pa.table({
            "asset_id": pa.array(ids, pa.int64()),
            "segment": pa.array(segs, pa.int32()),
            "start": pa.array(starts, pa.float64()),   # seconds, ref layout
            "end": pa.array(ends, pa.float64()),
            "text": pa.array(texts, pa.large_string()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })
