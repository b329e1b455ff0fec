"""Multimodal actor-pool stages: schema, determinism, flat-map shape."""

import pyarrow as pa

from joern_ray.stages import multimodal as MM

SF = "/root/testdata/sf0.001"


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
