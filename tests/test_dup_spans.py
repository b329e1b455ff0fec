"""Duplicated-substring coverage (Lee et al. 2021 ExactSubstr signal)."""

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data

from joern_ray.pipelines import text as T

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def test_dup_spans_matches_oracle(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = _norm(T.dup_spans(SF).to_pandas())
    want = _norm(con.execute(T.dup_spans_sql()).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the synthetic corpus genuinely exercises the signal
    assert got.n_dup_spans.sum() > 0
    assert (got.n_dup_spans <= got.n_spans).all()


def test_dup_spans_planted(ray_session, tmp_path):
    """Planted corpus pinning the semantics: a 4-gram shared between two
    docs marks its position in BOTH; a 4-gram repeated within ONE doc
    marks both positions; unique grams mark nothing; a short doc has
    zero spans."""
    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d x",        # 'a b c d' shared with doc 2
                 "q a b c d",        # ... and nothing else duplicated
                 "r s t u r s t u r s t u",  # self-repeating
                 "one two"],         # < 4 tokens: zero spans
    })
    import pyarrow.parquet as pq
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = (T.dup_spans(str(d)).to_pandas()
           .set_index("doc_id").sort_index())
    assert tuple(out.loc[1]) == (2, 1)   # 'a b c d', 'b c d x'
    assert tuple(out.loc[2]) == (2, 1)   # 'q a b c', 'a b c d'
    # doc 3: 12 tokens -> 9 spans; the four period-4 grams each occur
    # 2-3 times, so every position is duplicated
    assert tuple(out.loc[3]) == (9, 9)
    assert tuple(out.loc[4]) == (0, 0)
