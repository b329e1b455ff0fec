"""Bigram-LM corpus scorer: oracle match + broadcast/cogroup equivalence."""

import duckdb
import pandas as pd

from joern_ray.pipelines import text as T

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def test_bigram_lm_matches_oracle(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = _norm(T.bigram_lm(SF).to_pandas())
    want = _norm(con.execute(T.bigram_lm_sql()).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # a bigram is strictly rarer than its unigrams: the rarest-pair count
    # must not exceed the rarest-token count anywhere
    fam = T.familiarity(SF).to_pandas().set_index("doc_id")
    merged = got.set_index("doc_id").join(fam)
    pos = merged[merged.n_bigrams > 0]
    assert len(pos) and (pos.bg_min <= pos.freq_min).all()


def test_bigram_lm_cogroup_equivalence(ray_session):
    """The beyond-broadcast-vocab escape path computes identical scores
    with no driver-side vocabulary."""
    a = _norm(T.bigram_lm(SF).to_pandas())
    b = _norm(T.bigram_lm_cogroup(SF).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
