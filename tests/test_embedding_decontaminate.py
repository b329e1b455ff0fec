"""Semantic benchmark decontamination (ann.embedding_decontaminate):
planted contamination golden + the reference-bound guard."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from joern_ray.pipelines.ann import (SEMDECON_N_REF,
                                     embedding_decontaminate)


@pytest.fixture()
def planted_dir(tmp_path):
    """Reference = vec_ids 0..31 (unit basis vectors e_0..e_31 in R^64).
    Training: 100 = copy of ref 3 (contaminated), 101 = near-copy of
    ref 5 at cosine ~0.9 (contaminated), 102 = e_40 (orthogonal, kept),
    103 = mix at cosine ~0.2 to every ref (kept)."""
    dim = 64
    vecs, ids = [], []
    for i in range(SEMDECON_N_REF):
        v = np.zeros(dim); v[i] = 1.0
        vecs.append(v); ids.append(i)
    v3 = np.zeros(dim); v3[3] = 1.0
    v5 = np.zeros(dim); v5[5] = 0.9; v5[40] = np.sqrt(1 - 0.81)
    v40 = np.zeros(dim); v40[40] = 1.0
    vmix = np.full(dim, 1.0 / np.sqrt(dim)) * 0.2
    vmix[40] += np.sqrt(1 - 0.04)          # cosine to each e_i ~ 0.2/|.|
    for vid, v in ((100, v3), (101, v5), (102, v40), (103, vmix)):
        vecs.append(v); ids.append(vid)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.astype("float32").tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_planted_contamination_scrubbed(ray_session, planted_dir):
    kept = sorted(r["vec_id"] for r in
                  embedding_decontaminate(planted_dir).take_all())
    assert kept == [102, 103]


def test_threshold_boundary_override(ray_session, planted_dir):
    """With the threshold above the near-copy's cosine (0.9) only the
    exact copy is scrubbed."""
    kept = sorted(r["vec_id"] for r in
                  embedding_decontaminate(planted_dir,
                                          threshold=0.95).take_all())
    assert kept == [101, 102, 103]


def test_reference_bound_guard(ray_session, planted_dir, monkeypatch):
    import joern_ray.pipelines.ann as A
    monkeypatch.setattr(A, "SEMDECON_MAX_REF", 4)
    with pytest.raises(ValueError, match="SEMDECON_MAX_REF"):
        A.embedding_decontaminate(planted_dir)
