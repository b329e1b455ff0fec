"""Multimodal column plumbing: opaque binary payloads + actor-pool stages.

The payloads are now REAL self-describing media bytes and the decode path
is a real decoder (pure numpy — no PIL/libav needed for these formats):

- images: binary PPM (``P6``) — header parse + pixel reshape
  (``decode_ppm``), the same bytes any image tool would read;
- audio: PCM WAV (RIFF) — chunk walk + int16 sample extraction
  (``decode_wav``);
- video: a minimal length-prefixed container of concatenated PPM frames
  (``JRV1``) — frame-size header parse + per-frame PPM decode.

Reference precedent: the frontends parse real bytes, not digests
(``c2cpg/parser/CdtParser.scala``).  A byte-histogram FALLBACK remains for
payloads that are not self-describing (clearly marked below); it is no
longer on any synth path.  Everything Ray-side is unchanged and tested:
binary-column schema, small-batch sizing for large payloads, the
actor-pool contract (expensive setup once per actor in ``__init__``,
per-batch work in ``__call__`` — the reference's
one-parser-instance-per-pass discipline, ``AstCreationPass.scala:24``),
and deterministic output layout.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("meta_width", pa.int32()),
    ("meta_height", pa.int32()),
])

FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# pure-numpy codecs (self-describing formats; encoders live here so tests
# and synth share one byte layout)
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("PPM pixels must be (h, w, 3)")
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8 pixel array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    idx, vals = 2, []
    while len(vals) < 3:
        while payload[idx:idx + 1].isspace():
            idx += 1
        start = idx
        while not payload[idx:idx + 1].isspace():
            idx += 1
        vals.append(int(payload[start:idx]))
    idx += 1                              # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=idx)
    return data.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → PCM WAV (RIFF) bytes."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    n = len(data)
    return (b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", n) + data)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (int16 sample array, sample rate): RIFF chunk walk."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    idx, rate, samples = 12, 0, None
    while idx + 8 <= len(payload):
        cid = payload[idx:idx + 4]
        size = struct.unpack("<I", payload[idx + 4:idx + 8])[0]
        body = payload[idx + 8:idx + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            if fmt_tag != 1 or channels != 1:
                raise ValueError("only mono PCM supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        idx += 8 + size + (size & 1)      # RIFF chunks are 2-byte aligned
    if samples is None:
        raise ValueError("WAV payload has no data chunk")
    return samples, rate


_VIDEO_MAGIC = b"JRV1"


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Equal-shape (h, w, 3) frames → length-prefixed PPM-frame container."""
    blobs = [encode_ppm(f) for f in frames]
    if len({len(b) for b in blobs}) > 1:
        raise ValueError("video frames must share one shape")
    return (_VIDEO_MAGIC + struct.pack("<II", len(blobs),
                                       len(blobs[0]) if blobs else 0)
            + b"".join(blobs))


def decode_video(payload: bytes) -> list[np.ndarray]:
    """JRV1 container → list of decoded (h, w, 3) uint8 frames."""
    if payload[:4] != _VIDEO_MAGIC:
        raise ValueError("not a JRV1 payload")
    n_frames, frame_size = struct.unpack("<II", payload[4:12])
    return [decode_ppm(payload[12 + i * frame_size:
                               12 + (i + 1) * frame_size])
            for i in range(n_frames)]


def _signal256(payload: bytes) -> np.ndarray:
    """Decode a self-describing payload to its 256-bin VALUE histogram —
    pixels for images/video frames, 8-bit-requantized samples for audio.
    Payloads that are not self-describing fall back to the raw BYTE
    histogram (the explicitly-marked fake 'decode'; not on any synth
    path)."""
    if payload[:2] == b"P6":
        vals = decode_ppm(payload).ravel()
    elif payload[:4] == b"RIFF":
        samples, _ = decode_wav(payload)
        vals = ((samples.astype(np.int32) + 32768) >> 8).astype(np.uint8)
    elif payload[:4] == _VIDEO_MAGIC:
        frames = decode_video(payload)
        vals = (np.concatenate([f.ravel() for f in frames])
                if frames else np.zeros(0, np.uint8))
    else:
        # FALLBACK (fake): byte histogram of the still-encoded payload
        vals = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(vals, minlength=256).astype(np.float64)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract binary media payloads.

    Use as:
        ds.map_batches(MediaFeatureExtractor, concurrency=(2, 8),
                       batch_size=64, num_cpus=1, batch_format="pyarrow")

    batch_size stays SMALL because payloads are large binary blobs — a batch
    × concurrency must fit the worker heap (SURVEY.md §4 memory row).
    """

    def __init__(self):
        # once-per-actor setup (model load analog): a fixed projection
        # matrix seeded independently of workers
        self._proj = np.random.default_rng(9).standard_normal(
            (256, FEATURE_DIM))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, digests = [], []
        for payload in batch.column("payload").to_pylist():
            h = _signal256(payload)
            feats.append((h @ self._proj).astype(np.float32))
            digests.append(hashlib.blake2b(payload,
                                           digest_size=8).hexdigest())
        return pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "digest": pa.array(digests, pa.string()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


def _resize_nn(pixels: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure index arithmetic."""
    sh, sw = pixels.shape[:2]
    ri = (np.arange(h) * sh) // h
    ci = (np.arange(w) * sw) // w
    return pixels[ri][:, ci]


class MediaResizer:
    """Actor-pool resize stage: decode → scale → re-encode, real bytes in
    and out.  Images: PPM decode → nearest-neighbor resize → PPM encode.
    Audio: WAV decode → index-resample to w×h samples → WAV encode.
    Video: per-frame PPM resize → re-container.  Non-self-describing
    payloads keep the old histogram-rebin FALLBACK (marked)."""

    def __init__(self, *, target: tuple[int, int] = (32, 32)):
        self.target = target
        self.bins = max(16, min(256, target[0] * target[1] // 4))

    def _resize_payload(self, payload: bytes) -> bytes:
        w, h = self.target
        if payload[:2] == b"P6":
            return encode_ppm(_resize_nn(decode_ppm(payload), w, h))
        if payload[:4] == b"RIFF":
            samples, rate = decode_wav(payload)
            n_out = max(1, w * h)
            idx = (np.arange(n_out) * len(samples)) // n_out \
                if len(samples) else np.zeros(0, np.int64)
            return encode_wav(samples[idx] if len(samples)
                              else samples, rate)
        if payload[:4] == _VIDEO_MAGIC:
            return encode_video([_resize_nn(f, w, h)
                                 for f in decode_video(payload)])
        # FALLBACK (fake resize): histogram rebin of raw bytes
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr, minlength=256).astype(np.float64)
        rebin = hist.reshape(self.bins, -1).sum(axis=1)
        return (255 * rebin / max(rebin.max(), 1)).astype(np.uint8).tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads = [self._resize_payload(p)
                        for p in batch.column("payload").to_pylist()]
        n = batch.num_rows
        return pa.Table.from_arrays(
            [batch.column("media_id"), batch.column("media_type"),
             pa.array(out_payloads, pa.binary()),
             pa.array([self.target[0]] * n, pa.int32()),
             pa.array([self.target[1]] * n, pa.int32())],
            schema=MEDIA_SCHEMA)


FRAME_BYTES = 64


class FrameSampler:
    """Actor-pool frame sampling for video payloads: emit every k-th frame
    as its own row (a flat_map — output rows ≥ input rows).  JRV1
    containers are parsed for real (each emitted frame is a complete PPM
    payload); other payloads fall back to fixed-size byte chunking."""

    def __init__(self, *, every_k: int = 4):
        self.every_k = every_k

    def _frames(self, payload: bytes) -> list[bytes]:
        if payload[:4] == _VIDEO_MAGIC:
            n_frames, frame_size = struct.unpack("<II", payload[4:12])
            return [payload[12 + i * frame_size:12 + (i + 1) * frame_size]
                    for i in range(n_frames)]
        n = max(1, len(payload) // FRAME_BYTES)
        return [payload[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]
                for i in range(n)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            fs = self._frames(payload)
            for f in range(0, len(fs), self.every_k):
                ids.append(mid)
                frame_idx.append(f)
                frames.append(fs[f])
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


IMG_W, IMG_H = 16, 12
AUDIO_SAMPLES = 512
VIDEO_FRAMES, VID_W, VID_H = 6, 8, 6


def synthesize_media(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic REAL media payloads derived from document text: PPM
    images, PCM WAV audio, JRV1 video containers — content seeded by a
    text digest so every run (and every implementation of the decoders)
    sees identical bytes."""
    def fn(t: pa.Table) -> pa.Table:
        payloads, mtypes, ws, hs = [], [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            seed = int.from_bytes(
                hashlib.blake2b((text or "").encode("utf-8"),
                                digest_size=8).digest(), "little")
            rng = np.random.default_rng(seed)
            kind = did % 3
            if kind == 0:
                px = rng.integers(0, 256, (IMG_H, IMG_W, 3), np.uint8)
                payloads.append(encode_ppm(px))
                mtypes.append("image")
                ws.append(IMG_W)
                hs.append(IMG_H)
            elif kind == 1:
                samples = rng.integers(-32768, 32768, AUDIO_SAMPLES
                                       ).astype(np.int16)
                payloads.append(encode_wav(samples))
                mtypes.append("audio")
                ws.append(0)
                hs.append(0)
            else:
                frames = [rng.integers(0, 256, (VID_H, VID_W, 3), np.uint8)
                          for _ in range(VIDEO_FRAMES)]
                payloads.append(encode_video(frames))
                mtypes.append("video")
                ws.append(VID_W)
                hs.append(VID_H)
        return pa.Table.from_arrays(
            [t.column("doc_id").cast(pa.int64()),
             pa.array(mtypes, pa.string()),
             pa.array(payloads, pa.binary()),
             pa.array(ws, pa.int32()),
             pa.array(hs, pa.int32())],
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
