"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
structs; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages. The decode libraries (PIL/cv2/
torchaudio) are not in this container, so the codec call is stubbed
behind ``decoder="fake"`` (deterministic bytes-derived features) or
raises ``NotImplementedError`` for ``decoder="real"`` — the Ray-side
plumbing (schema, batch sizing, actor signature, output layout) is real
and tested.

Batch sizes for binary payloads must stay small (payload × batch ×
concurrency bounded by worker heap — SURVEY.md §4 memory notes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("duration_ms", pa.int32())])),
])


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec+model: bytes → feature vector."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(out_dim).astype(np.float32)
    return v / np.linalg.norm(v)


class MediaFeatureExtractor:
    """Actor-pool stage: media rows → (media_ref, kind, feature[D]).

    __init__ is where a real model would load (once per actor); __call__
    decodes + embeds one small batch. Use batch_size≈32-256 for media."""

    def __init__(self, out_dim: int = 32, decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        if decoder == "real":  # pragma: no cover - no codec libs in container
            raise NotImplementedError(
                "real decoders (PIL/cv2/torchaudio) are not available in "
                "this environment; use decoder='fake'")
        self.out_dim = out_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([_fake_decode(p or b"", self.out_dim) for p in payloads]) \
            if payloads else np.zeros((0, self.out_dim), dtype=np.float32)
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "kind": batch.column("kind"),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), self.out_dim),
        })


class FrameSampler:
    """Actor-pool stage: video rows → one row per sampled frame index.

    Frame *extraction* is stubbed (no codec); the sampling plan —
    which frame indices, one output row each, metadata carried — is the
    real distributed logic."""

    def __init__(self, every_ms: int = 1000, decoder: str = "fake") -> None:
        if decoder == "real":  # pragma: no cover
            raise NotImplementedError("no video codec in this environment")
        if decoder != "fake":
            # fail fast on typos, like the sibling actors
            raise ValueError(decoder)
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        metas = batch.column("meta").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_ref, out_idx, out_ts, out_fp = [], [], [], []
        for ref, meta, payload in zip(refs, metas, payloads):
            # zero/null duration (metadata-extraction failure) → zero
            # frames: fabricating a frame_idx=0 row here would inflate
            # frame counts and pollute frame-dedup joins with a
            # fingerprint that corresponds to no actual frame
            dur = (meta or {}).get("duration_ms") or 0
            for i, ts in enumerate(range(0, dur, self.every_ms)):
                out_ref.append(ref)
                out_idx.append(i)
                out_ts.append(ts)
                out_fp.append(hashlib.sha1((payload or b"") + ts.to_bytes(8, "big")).hexdigest()[:16])
        return pa.table({
            "media_ref": pa.array(out_ref, type=pa.string()),
            "frame_idx": pa.array(out_idx, type=pa.int32()),
            "ts_ms": pa.array(out_ts, type=pa.int32()),
            "frame_fp": pa.array(out_fp, type=pa.string()),
        })


def extract_media_features(ds: Dataset, out_dim: int = 32,
                           concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    return ds.map_batches(MediaFeatureExtractor,
                          fn_constructor_kwargs={"out_dim": out_dim},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def sample_frames(ds: Dataset, every_ms: int = 1000,
                  concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    return ds.map_batches(FrameSampler,
                          fn_constructor_kwargs={"every_ms": every_ms},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


class MediaResizer:
    """Actor-pool stage: media rows → aspect-preserving resize into a
    (max_w, max_h) box. The geometry is PURE INTEGER arithmetic (cross-
    multiplied comparison + floor division), so the plan half is exact
    and SQL-checkable; the pixel resample itself is the stubbed codec
    call (``decoder="fake"`` emits a deterministic bytes-derived stand-
    in payload, ``"real"`` raises — no PIL/cv2 in this container)."""

    def __init__(self, max_w: int = 224, max_h: int = 224,
                 decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        if decoder == "real":  # pragma: no cover - no codec libs here
            raise NotImplementedError(
                "real resize (PIL/cv2) is not available in this "
                "environment; use decoder='fake'")
        self.max_w = int(max_w)
        self.max_h = int(max_h)

    def plan(self, w: int, h: int) -> tuple[int, int]:
        """(out_w, out_h) fitting (w, h) into the box, aspect kept.
        Width binds when w*max_h >= h*max_w; the other edge floors."""
        w, h = max(int(w), 1), max(int(h), 1)
        if w * self.max_h >= h * self.max_w:
            return self.max_w, max(1, (h * self.max_w) // w)
        return max(1, (w * self.max_h) // h), self.max_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = batch.column("meta").to_pylist()
        payloads = batch.column("payload").to_pylist()
        in_w, in_h, out_w, out_h, out_payload = [], [], [], [], []
        for meta, payload in zip(metas, payloads):
            w = (meta or {}).get("width") or 1
            h = (meta or {}).get("height") or 1
            ow, oh = self.plan(w, h)
            in_w.append(w)
            in_h.append(h)
            out_w.append(ow)
            out_h.append(oh)
            out_payload.append(hashlib.sha1(
                (payload or b"") + ow.to_bytes(4, "big")
                + oh.to_bytes(4, "big")).digest())
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "in_w": pa.array(in_w, type=pa.int32()),
            "in_h": pa.array(in_h, type=pa.int32()),
            "out_w": pa.array(out_w, type=pa.int32()),
            "out_h": pa.array(out_h, type=pa.int32()),
            "payload": pa.array(out_payload, type=pa.binary()),
        })


def resize_media(ds: Dataset, max_w: int = 224, max_h: int = 224,
                 concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    return ds.map_batches(MediaResizer,
                          fn_constructor_kwargs={"max_w": max_w,
                                                 "max_h": max_h},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
