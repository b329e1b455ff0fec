"""DSIR importance-resampling weights (text.dsir_weights): planted
target-domain golden, broadcast-vs-cogroup equivalence, and the
zero-row contract for empty/one-token docs."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from joern_ray.pipelines.text import (DSIR_TARGET_SOURCES, dsir_weights,
                                      dsir_weights_cogroup)


@pytest.fixture()
def planted_dir(tmp_path):
    """4 docs: two target-domain docs share the bigram 'alpha beta';
    one raw doc repeats a raw-only bigram; one doc is a single token."""
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["alpha beta", "alpha beta gamma",
                          "delta zeta delta zeta", "solo"]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array([DSIR_TARGET_SOURCES[0], DSIR_TARGET_SOURCES[1],
                            "raw_only", "raw_only"]),
        "n_chars": pa.array([10, 16, 21, 4], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def _rows(ds):
    return {r["doc_id"]: (r["n_bigrams"], r["tgt_sum"], r["raw_sum"],
                          r["dsir_milli"]) for r in ds.take_all()}


def test_dsir_planted_golden(ray_session, planted_dir):
    got = _rows(dsir_weights(planted_dir))
    # raw counts: 'alpha beta'=2, 'beta gamma'=1, 'delta zeta'=2,
    #             'zeta delta'=1; target counts: 'alpha beta'=2,
    #             'beta gamma'=1 (docs 1,2 are target)
    r_ab = (1000 * 3) // 3      # 1000
    r_bg = (1000 * 2) // 2      # 1000
    r_dz = (1000 * 1) // 3      # 333
    r_zd = (1000 * 1) // 2      # 500
    assert got == {
        1: (1, 2, 2, r_ab),
        2: (2, 3, 3, r_ab + r_bg),
        3: (3, 0, 5, 2 * r_dz + r_zd),
        4: (0, 0, 0, 0),        # single token -> no bigrams, zero row
    }


def test_dsir_cogroup_equivalence(ray_session, planted_dir):
    assert _rows(dsir_weights_cogroup(planted_dir)) == \
        _rows(dsir_weights(planted_dir))


def test_dsir_cogroup_equivalence_real(ray_session, sf_small):
    assert _rows(dsir_weights_cogroup(sf_small)) == \
        _rows(dsir_weights(sf_small))
