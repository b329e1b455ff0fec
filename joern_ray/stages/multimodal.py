"""Multimodal column plumbing: opaque binary payloads + actor-pool stages.

Image/audio decode libraries are NOT available in this environment, so the
decode kernel itself is STUBBED (clearly marked below) — but everything
Ray-side is real and tested: binary-column schema, small-batch sizing for
large payloads, the actor-pool contract (expensive setup once per actor in
``__init__``, per-batch work in ``__call__`` — the reference's
one-parser-instance-per-pass discipline, ``AstCreationPass.scala:24``), and
deterministic output layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

try:  # real decoders, if ever present
    import PIL.Image  # noqa: F401
    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("meta_width", pa.int32()),
    ("meta_height", pa.int32()),
])

FEATURE_DIM = 16


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract binary media payloads.

    Use as:
        ds.map_batches(MediaFeatureExtractor, concurrency=(2, 8),
                       batch_size=64, num_cpus=1, batch_format="pyarrow")

    batch_size stays SMALL because payloads are large binary blobs — a batch
    × concurrency must fit the worker heap (SURVEY.md §4 memory row).
    """

    def __init__(self, *, use_real_decoder: bool = False):
        # once-per-actor setup (model load analog); deterministic fake
        # "model": a fixed projection matrix seeded independently of workers
        self._proj = np.random.default_rng(9).standard_normal((256, FEATURE_DIM))
        self._use_real = use_real_decoder

    def _decode(self, payload: bytes) -> np.ndarray:
        if self._use_real:
            if not _HAVE_PIL:
                # STUB: real decoding needs PIL/libav, absent here by design
                raise NotImplementedError(
                    "real media decoding unavailable in this environment")
            raise NotImplementedError("real decoder path not wired yet")
        # deterministic fake decode: byte histogram as the "pixel" signal
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr, minlength=256).astype(np.float64)
        return hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, digests = [], []
        for payload in batch.column("payload").to_pylist():
            h = self._decode(payload)
            feats.append((h @ self._proj).astype(np.float32))
            digests.append(hashlib.blake2b(payload, digest_size=8).hexdigest())
        return pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "digest": pa.array(digests, pa.string()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class MediaResizer:
    """Actor-pool resize stage: decode → scale → re-encode.

    The decode/encode kernels are STUBBED (no PIL/libav here): "decode"
    is the deterministic byte-histogram, "resize" is a histogram rebin to
    the target resolution's bucket count, "encode" is the raw rebinned
    bytes.  The Ray plumbing — actor signature, small batches for big
    payloads, metadata update — is the real contract."""

    def __init__(self, *, target: tuple[int, int] = (32, 32)):
        self.target = target
        self.bins = max(16, min(256, target[0] * target[1] // 4))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads = []
        for payload in batch.column("payload").to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr, minlength=256).astype(np.float64)
            rebin = hist.reshape(self.bins, -1).sum(axis=1)
            scaled = (255 * rebin / max(rebin.max(), 1)).astype(np.uint8)
            out_payloads.append(scaled.tobytes())
        n = batch.num_rows
        return pa.Table.from_arrays(
            [batch.column("media_id"), batch.column("media_type"),
             pa.array(out_payloads, pa.binary()),
             pa.array([self.target[0]] * n, pa.int32()),
             pa.array([self.target[1]] * n, pa.int32())],
            schema=MEDIA_SCHEMA)


FRAME_BYTES = 64


class FrameSampler:
    """Actor-pool frame sampling for "video" payloads: emit every k-th
    frame as its own row (a flat_map — output rows ≥ input rows).  Frames
    are fixed-size payload chunks (the container-parsing stub)."""

    def __init__(self, *, every_k: int = 4):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            n_frames = max(1, len(payload) // FRAME_BYTES)
            for f in range(0, n_frames, self.every_k):
                ids.append(mid)
                frame_idx.append(f)
                frames.append(payload[f * FRAME_BYTES:(f + 1) * FRAME_BYTES])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def resized_features(sf_dir: str):
    """documents → media → resize (actor pool) → features (actor pool):
    two chained stateful stages, small batches for binary payloads."""
    import os
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])
    media = synthesize_media(docs)
    # chained actor pools: min pool size 1 so the two stages + upstream
    # read tasks co-schedule even on small CPU budgets
    resized = media.map_batches(MediaResizer, concurrency=(1, 4),
                                batch_size=64, num_cpus=1,
                                batch_format="pyarrow")
    return resized.map_batches(MediaFeatureExtractor, concurrency=(1, 4),
                               batch_size=64, num_cpus=1,
                               batch_format="pyarrow")


def sampled_frames(sf_dir: str):
    import os
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])
    media = synthesize_media(docs)
    return media.map_batches(FrameSampler, concurrency=2, batch_size=64,
                             num_cpus=1, batch_format="pyarrow")


def synthesize_media(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic binary payloads derived from document text (the test
    stand-in for real image bytes)."""
    def fn(t: pa.Table) -> pa.Table:
        payloads = [s.encode("utf-8") * 4 for s in t.column("text").to_pylist()]
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()),
             pa.array(["image"] * n, pa.string()),
             pa.array(payloads, pa.binary()),
             pa.array([64] * n, pa.int32()),
             pa.array([64] * n, pa.int32())],
            schema=MEDIA_SCHEMA)
    return docs_ds.map_batches(fn, batch_format="pyarrow")


def media_features(sf_dir: str):
    """documents → synthetic media payloads → actor-pool feature extraction."""
    import os
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])
    media = synthesize_media(docs)
    return media.map_batches(
        MediaFeatureExtractor, concurrency=2, batch_size=64,
        num_cpus=1, batch_format="pyarrow")
