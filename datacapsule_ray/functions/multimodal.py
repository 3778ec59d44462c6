"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
structs; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages. Two decoder backends:

- ``decoder="fake"`` — deterministic bytes-derived stand-in (no pixel
  decode; any payload works). The default for the synthetic gate
  corpora, whose payloads are not images.
- ``decoder="real"`` — an actual bytes→pixels path via the stdlib/
  numpy PPM/PGM/BMP codec (functions/imagecodec.py): features come
  from a decoded integer-luma grid, resize decodes, nearest-neighbor
  resamples and re-encodes real pixels. Formats needing a codec
  library (JPEG/PNG/video) are undecodable here; a row that fails
  decode follows the M11 errors-become-data convention — the extractor
  emits an all-zero feature (real features are unit-norm, so norm 0 ==
  decode failure) and the resizer emits a null payload with the
  meta-planned geometry — rather than killing a 100-TB job on one
  corrupt blob. Video frame *extraction* stays NotImplementedError:
  no container format this stack can parse without a codec library.

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
    decodes + embeds one small batch. Use batch_size≈32-256 for media.

    ``decoder="real"``: decode pixels (PPM/PGM/BMP), integer-luma
    grayscale, nearest-resample to a g×g grid with g = ceil(√out_dim),
    flatten the first out_dim cells, center and L2-normalize — a real
    deterministic pixels→vector featurizer (the model slot). Decode
    failure → all-zero vector (norm 0 flags it; real features are
    unit-norm)."""

    def __init__(self, out_dim: int = 32, decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.out_dim = out_dim
        self.grid = int(np.ceil(np.sqrt(out_dim)))

    def _real_decode(self, payload: bytes) -> np.ndarray:
        from .imagecodec import (ImageDecodeError, decode_image, gray_luma,
                                 resize_nearest)

        try:
            px = decode_image(payload)
        except ImageDecodeError:
            return np.zeros(self.out_dim, dtype=np.float32)
        g = gray_luma(resize_nearest(px, self.grid, self.grid))
        v = g.ravel()[: self.out_dim].astype(np.float32)
        if len(v) < self.out_dim:  # out_dim < grid² never; keep safe
            v = np.pad(v, (0, self.out_dim - len(v)))
        v = v - v.mean()
        n = np.linalg.norm(v)
        if n == 0.0:  # flat image: direction undefined, pick e0
            v = np.zeros(self.out_dim, dtype=np.float32)
            v[0] = 1.0
            return v
        return v / n

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        fn = (self._real_decode if self.decoder == "real"
              else lambda p: _fake_decode(p, self.out_dim))
        feats = np.stack([fn(p or b"") for p in payloads]) \
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
            raise NotImplementedError(
                "video frame extraction needs a container/codec parser "
                "(mp4/mkv/h264) that no stdlib path provides; still-image "
                "payloads have a real path via MediaFeatureExtractor/"
                "MediaResizer (functions/imagecodec.py)")
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
                           concurrency=(1, 4), batch_size: int = 64,
                           decoder: str = "fake") -> Dataset:
    return ds.map_batches(MediaFeatureExtractor,
                          fn_constructor_kwargs={"out_dim": out_dim,
                                                 "decoder": decoder},
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
    and SQL-checkable. ``decoder="fake"`` emits a deterministic
    bytes-derived stand-in payload sized by the *metadata* geometry;
    ``decoder="real"`` decodes the payload (PPM/PGM/BMP —
    functions/imagecodec.py), plans from the DECODED dimensions (pixels
    are ground truth on the real path; metadata can lie),
    nearest-resamples and re-encodes as P6 PPM. A real-path decode
    failure emits a null payload with the metadata-planned geometry
    (errors-become-data, like the extractor's zero vector)."""

    def __init__(self, max_w: int = 224, max_h: int = 224,
                 decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
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
        if self.decoder == "real":
            from .imagecodec import (ImageDecodeError, decode_image,
                                     encode_ppm, resize_nearest)
        metas = batch.column("meta").to_pylist()
        payloads = batch.column("payload").to_pylist()
        in_w, in_h, out_w, out_h, out_payload = [], [], [], [], []
        for meta, payload in zip(metas, payloads):
            if self.decoder == "real":
                try:
                    px = decode_image(payload or b"")
                    h, w = px.shape[:2]
                    ow, oh = self.plan(w, h)
                    out_payload.append(
                        encode_ppm(resize_nearest(px, ow, oh)))
                except ImageDecodeError:
                    w = (meta or {}).get("width") or 1
                    h = (meta or {}).get("height") or 1
                    ow, oh = self.plan(w, h)
                    out_payload.append(None)
            else:
                w = (meta or {}).get("width") or 1
                h = (meta or {}).get("height") or 1
                ow, oh = self.plan(w, h)
                out_payload.append(hashlib.sha1(
                    (payload or b"") + ow.to_bytes(4, "big")
                    + oh.to_bytes(4, "big")).digest())
            in_w.append(w)
            in_h.append(h)
            out_w.append(ow)
            out_h.append(oh)
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "in_w": pa.array(in_w, type=pa.int32()),
            "in_h": pa.array(in_h, type=pa.int32()),
            "out_w": pa.array(out_w, type=pa.int32()),
            "out_h": pa.array(out_h, type=pa.int32()),
            "payload": pa.array(out_payload, type=pa.binary()),
        })


def resize_media(ds: Dataset, max_w: int = 224, max_h: int = 224,
                 concurrency=(1, 4), batch_size: int = 64,
                 decoder: str = "fake") -> Dataset:
    return ds.map_batches(MediaResizer,
                          fn_constructor_kwargs={"max_w": max_w,
                                                 "max_h": max_h,
                                                 "decoder": decoder},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
