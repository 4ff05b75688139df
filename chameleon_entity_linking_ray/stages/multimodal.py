"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
actor-pool decode / feature-extract / resize / frame-sample stages.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): each stage either raises ``NotImplementedError`` (strict
mode) or produces a deterministic fake derived from the payload bytes
(``fake=True``, default) — the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested, so swapping in a real
``PIL.Image.open`` / ``torchaudio.load`` is a one-line change in ``_decode``.

Scale notes: payload batches are kept SMALL (``batch_size`` default 32 —
large binary payloads x concurrency must fit worker heaps); stages are
actor pools so codec/model setup happens once per worker, not per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from chameleon_entity_linking_ray.functions.hashing import mix64

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # "image" | "audio" | "video"
    ("payload", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),          # -1 when unknown/not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media(n: int, seed: int = 7, kind: str = "image") -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.randint(0, 256, size=int(64 + rng.randint(0, 192)),
                            dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "kind": pa.array([kind] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["application/octet-stream"] * n, pa.string()),
        "width": pa.array(rng.randint(16, 512, n).astype(np.int32), pa.int32()),
        "height": pa.array(rng.randint(16, 512, n).astype(np.int32), pa.int32()),
        "duration_ms": pa.array(np.full(n, -1, np.int32), pa.int32()),
    })


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic pixel fake: payload bytes tiled to (h, w) uint8."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(w * h / max(1, raw.size)))
    return np.tile(raw, reps)[: w * h].reshape(h, w)


class MediaDecoder:
    """Actor-pool stage: payload -> decoded feature columns.

    ``__init__`` is the codec/model load point (once per actor);
    ``__call__`` is the per-batch decode. With ``fake=False`` it raises
    ``NotImplementedError`` at the exact line a real decoder plugs into.
    """

    def __init__(self, fake: bool = True, feature_dim: int = 16):
        self.fake = fake
        self.feature_dim = feature_dim
        # real implementation: import PIL / torchaudio HERE (once per actor)

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image/audio codecs are not available in this environment; "
                "plug PIL.Image.open / torchaudio.load here")
        return _fake_pixels(payload, max(1, w), max(1, h))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_numpy(zero_copy_only=False)
        hs = batch.column("height").to_numpy(zero_copy_only=False)
        feats = np.zeros((len(payloads), self.feature_dim), dtype=np.float32)
        means = np.zeros(len(payloads), dtype=np.float32)
        for i, p in enumerate(payloads):
            px = self._decode(p, int(ws[i]), int(hs[i]))
            means[i] = float(px.mean())
            hist, _ = np.histogram(px, bins=self.feature_dim, range=(0, 256))
            total = max(1, hist.sum())
            feats[i] = hist / total
        return pa.table({
            "media_id": batch.column("media_id"),
            "mean_intensity": pa.array(means, pa.float32()),
            "feature": pa.array(list(feats), pa.list_(pa.float32(),
                                                      self.feature_dim)),
        })


class FrameSampler:
    """Actor-pool stage: sample ``n_frames`` deterministic offsets per video
    payload — one output row per (media, frame)."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("video codec unavailable; plug decoder here")
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_ids, out_frame, out_bytes = [], [], []
        for mid, p in zip(ids, payloads):
            raw = np.frombuffer(p, dtype=np.uint8)
            step = max(1, len(raw) // max(1, self.n_frames))
            for f in range(self.n_frames):
                s = (f * step) % max(1, len(raw))
                out_ids.append(int(mid))
                out_frame.append(f)
                out_bytes.append(raw[s:s + step].tobytes())
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "frame_payload": pa.array(out_bytes, pa.binary()),
        })


def decode_media(ds: Dataset, fake: bool = True, feature_dim: int = 16,
                 batch_size: int = 32, concurrency: int = 4) -> Dataset:
    """payload -> (media_id, mean_intensity, feature[dim]) via actor pool.
    Small batch_size on purpose: batch bytes x concurrency bounds heap."""
    return ds.map_batches(MediaDecoder,
                          fn_constructor_kwargs={"fake": fake,
                                                 "feature_dim": feature_dim},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def sample_frames(ds: Dataset, n_frames: int = 4, fake: bool = True,
                  batch_size: int = 16, concurrency: int = 2) -> Dataset:
    return ds.map_batches(FrameSampler,
                          fn_constructor_kwargs={"n_frames": n_frames,
                                                 "fake": fake},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
