"""Multimodal (image/audio/video) column plumbing — actor-pool stages.

Real decoders (PIL/libav/etc.) are NOT in this container, so the decode step
is STUBBED two ways (per round instructions):

- ``decoder="none"`` raises NotImplementedError at actor construction —
  the honest production placeholder.
- ``decoder="fake"`` (default in tests) derives deterministic pseudo-features
  purely from the payload bytes, so the Ray-side plumbing — binary columns,
  typed metadata, batch sizing, actor signature, output layout — is real and
  testable end to end.

Shape notes for the real thing: binary payloads make rows huge, so run with
small ``batch_size`` (16-64), keep ``batch_format="pyarrow"`` (binary columns
don't survive pandas object dtype well), and size ``concurrency`` by decoder
memory, not CPU.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["MediaDecoder", "decode_media", "frame_sample", "MEDIA_SCHEMA"]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON sidecar (codec, dims, sample rate, ...)
    ]
)


class MediaDecoder:
    """Actor-pool UDF: decode binary payloads → fixed-size feature vectors.

    __init__ runs once per actor (model/codec load goes here); __call__ runs
    per batch, vectorized over the batch's payloads."""

    def __init__(self, kind: str = "image", n_features: int = 16, decoder: str = "fake"):
        self.kind = kind
        self.n_features = n_features
        if decoder == "none":
            raise NotImplementedError(
                "real media decoding requires image/audio libraries not present "
                "in this environment; use decoder='fake' for plumbing tests"
            )
        if decoder != "fake":
            raise ValueError(f"unknown decoder: {decoder}")
        # per-actor state: a fixed projection 'model' (stands in for weights)
        rng = np.random.default_rng(42)
        self.projection = rng.standard_normal((256, n_features))

    def _features(self, payload: bytes) -> np.ndarray:
        """Deterministic pseudo-decode: byte histogram → projection."""
        b = np.frombuffer(payload, dtype=np.uint8) if payload else np.zeros(1, np.uint8)
        hist = np.bincount(b, minlength=256).astype(np.float64)
        hist /= max(hist.sum(), 1.0)
        return hist @ self.projection

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p.as_py()) for p in batch["payload"]]
        sizes = [len(p.as_py() or b"") for p in batch["payload"]]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(sizes, pa.int64()),
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


def decode_media(ds, kind: str = "image", n_features: int = 16, decoder: str = "fake", batch_size: int = 32, concurrency=(1, 4)):
    """Binary media rows → feature rows via a stateful actor pool."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_args=(kind, n_features, decoder),
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def frame_sample(ds, every_n_bytes: int = 1024, frame_bytes: int = 64, batch_size: int = 32):
    """'Video' frame sampling stand-in: deterministic byte-stride slices of
    each payload → one row per sampled frame (flat_map shape via map_batches)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            data = payload or b""
            for k, off in enumerate(range(0, len(data), every_n_bytes)):
                ids.append(mid)
                idxs.append(k)
                frames.append(data[off : off + frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )

    return ds.map_batches(fn, batch_size=batch_size, batch_format="pyarrow")
