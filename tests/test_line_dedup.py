"""C4-style corpus-wide line-level dedup (conv = doc, turn = line)."""

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data

from joern_ray import synth
from joern_ray.pipelines import text as T

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def test_line_dedup_matches_oracle(ray_session):
    tp = synth.transcripts_path(SF)
    got = _norm(T.line_dedup(ray.data.read_parquet(tp)).to_pandas())
    want = _norm(duckdb.sql(
        T.line_dedup_sql(f"read_parquet('{tp}')")).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the synthetic corpus genuinely exercises the operator: duplicate
    # lines exist, and at least one conversation loses a line
    assert want.n_lines.sum() > want.n_kept.sum()


def test_line_dedup_first_occurrence_semantics(ray_session):
    """Planted corpus pinning the keep rule: the single FIRST global
    occurrence (min (conv_id, turn_idx)) survives — later occurrences in
    OTHER convs and later occurrences in the SAME conv are both dropped."""
    rows = pa.table({
        "conv_id": ["a", "a", "a", "b", "b", "c"],
        "turn_idx": [0, 1, 2, 0, 1, 0],
        "text": ["dup", "only-a", "dup",      # same-conv repeat dropped
                 "dup", "only-b",             # cross-conv repeat dropped
                 "only-c"],
    })
    out = (T.line_dedup(ray.data.from_arrow(rows)).to_pandas()
           .set_index("conv_id").sort_index())
    assert out.loc["a", "n_lines"] == 3 and out.loc["a", "n_kept"] == 2
    assert out.loc["b", "n_lines"] == 2 and out.loc["b", "n_kept"] == 1
    assert out.loc["c", "n_lines"] == 1 and out.loc["c", "n_kept"] == 1
