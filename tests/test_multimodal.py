"""Multimodal actor-pool stages: schema, determinism, flat-map shape,
and REAL-decoder goldens (pure-numpy PPM/WAV/JRV1 codecs)."""

import numpy as np
import pyarrow as pa

from joern_ray.stages import multimodal as MM

SF = "/root/testdata/sf0.001"


def test_ppm_codec_golden_pixels():
    """Decode asserts KNOWN pixel values from a hand-built payload, and
    the header layout is genuine P6 (any image tool would read it)."""
    px = np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [10, 20, 30]]], np.uint8)
    payload = MM.encode_ppm(px)
    assert payload.startswith(b"P6\n2 2\n255\n")
    out = MM.decode_ppm(payload)
    assert out.shape == (2, 2, 3)
    assert (out == px).all()
    # hand-written header variant (extra whitespace) also parses
    alt = b"P6\n 2  2 \n255\n" + px.tobytes()
    assert (MM.decode_ppm(alt) == px).all()


def test_wav_codec_golden_samples():
    samples = np.array([0, 32767, -32768, 1234, -1], np.int16)
    payload = MM.encode_wav(samples, rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    out, rate = MM.decode_wav(payload)
    assert rate == 8000
    assert (out == samples).all()


def test_video_container_roundtrip_and_sampler_parses_real_frames():
    frames = [np.full((2, 2, 3), i, np.uint8) for i in range(8)]
    payload = MM.encode_video(frames)
    decoded = MM.decode_video(payload)
    assert len(decoded) == 8
    assert all((a == b).all() for a, b in zip(decoded, frames))
    # FrameSampler emits every k-th frame as a COMPLETE PPM payload
    sampler = MM.FrameSampler(every_k=4)
    batch = pa.table({"media_id": pa.array([7], pa.int64()),
                      "payload": pa.array([payload], pa.binary())})
    out = sampler(batch)
    assert out.column("frame_idx").to_pylist() == [0, 4]
    for fi, fb in zip(out.column("frame_idx").to_pylist(),
                      out.column("frame").to_pylist()):
        assert (MM.decode_ppm(fb) == frames[fi]).all()


def test_resizer_emits_real_reencoded_media():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (12, 16, 3), np.uint8)
    wav = MM.encode_wav(rng.integers(-100, 100, 64).astype(np.int16))
    batch = pa.Table.from_arrays(
        [pa.array([1, 2], pa.int64()),
         pa.array(["image", "audio"], pa.string()),
         pa.array([MM.encode_ppm(px), wav], pa.binary()),
         pa.array([16, 0], pa.int32()), pa.array([12, 0], pa.int32())],
        schema=MM.MEDIA_SCHEMA)
    out = MM.MediaResizer(target=(4, 4))(batch)
    img_out, wav_out = out.column("payload").to_pylist()
    resized = MM.decode_ppm(img_out)
    assert resized.shape == (4, 4, 3)
    # nearest-neighbor: every output pixel is SOME input pixel
    flat_in = px.reshape(-1, 3)
    assert all(any((p == q).all() for q in flat_in)
               for p in resized.reshape(-1, 3))
    samples, rate = MM.decode_wav(wav_out)
    assert len(samples) == 16 and rate == 8000


def test_features_deterministic_across_runs(ray_session):
    a = MM.media_features(SF).to_pandas().sort_values("media_id",
                                                      ignore_index=True)
    b = MM.media_features(SF).to_pandas().sort_values("media_id",
                                                      ignore_index=True)
    assert a["digest"].tolist() == b["digest"].tolist()
    assert all(len(f) == MM.FEATURE_DIM for f in a["features"])


def test_resized_features_schema(ray_session):
    df = MM.resized_features(SF).to_pandas()
    assert set(df.columns) == {"media_id", "media_type", "digest",
                               "features"}
    assert len(df) > 0


def test_frame_sampler_is_flat_map(ray_session):
    frames = MM.sampled_frames(SF).to_pandas()
    n_media = MM.media_features(SF).count()
    assert len(frames) >= n_media           # ≥ one frame per media
    assert (frames["frame_idx"] % 4 == 0).all()
    per = frames.groupby("media_id")["frame_idx"].apply(
        lambda s: sorted(s.tolist()))
    assert all(v == sorted(set(v)) for v in per)
