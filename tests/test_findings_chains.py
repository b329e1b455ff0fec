"""Findings scan battery + mention chains vs DuckDB oracles on sf0.001."""

import duckdb
import pandas as pd
import pytest

from joern_ray import synth
from joern_ray.pipelines import findings as FND
from joern_ray.stages import chains as CH

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


@pytest.fixture(scope="module")
def rel():
    return f"read_parquet('{synth.transcripts_path(SF)}')"


def test_findings_match_oracle(ray_session, rel):
    got = _norm(FND.findings(SF).to_pandas())
    want = _norm(duckdb.sql(FND.findings_sql(rel)).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["rule"]) >= {"org-acquisition"}


def test_snippets_match_oracle(ray_session, rel):
    got = _norm(FND.snippets(SF).to_pandas())
    want = _norm(duckdb.sql(FND.snippets_sql(rel)).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mention_chains_match_oracle(ray_session, rel):
    got = _norm(CH.mention_chains_query(SF).to_pandas())
    want = _norm(duckdb.sql(CH.mention_chains_sql(rel)).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # chains are strictly forward in turn order
    raw = CH.mention_chains_query(SF).to_pandas()
    assert (raw["to_turn"] > raw["from_turn"]).all()
