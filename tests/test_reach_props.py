"""Frontier-BFS reachability + JSON props extraction vs DuckDB oracles."""

import duckdb
import pandas as pd
import pytest

from joern_ray import synth
from joern_ray.pipelines import events as EV
from joern_ray.stages import reach as RCH

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def test_reachable_matches_recursive_cte(ray_session):
    rel = f"read_parquet('{synth.transcripts_path(SF)}')"
    got = _norm(RCH.reachable_query(SF).to_pandas())
    want = _norm(duckdb.sql(RCH.reachable_sql(rel)).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    seeds = got[(got["kind"] == "person") & (got["norm"] == "alice")]
    assert (seeds["depth"] == 0).all() and len(seeds) == 1


def test_reachable_depth_monotone(ray_session):
    df = RCH.reachable_query(SF, max_depth=1).to_pandas()
    d2 = RCH.reachable_query(SF, max_depth=2).to_pandas()
    assert set(map(tuple, df[["kind", "norm"]].values)) <= \
        set(map(tuple, d2[["kind", "norm"]].values))
    assert df["depth"].max() <= 1 and d2["depth"].max() <= 2


def test_props_k_stats_matches_oracle(ray_session):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    got = _norm(EV.props_k_stats(SF).to_pandas())
    want = _norm(con.execute(EV.props_k_stats_sql()).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_paths_matches_recursive_cte_and_witnesses_walk_to_seed(ray_session):
    rel = f"read_parquet('{synth.transcripts_path(SF)}')"
    got = _norm(RCH.paths_query(SF).to_pandas())
    want = _norm(duckdb.sql(RCH.paths_sql(rel)).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the via chain is a real shortest path: via of a depth-d node is a
    # depth-(d-1) node; seeds have no via
    df = got.set_index(got["kind"] + ":" + got["norm"])
    for _, row in got.iterrows():
        if row["depth"] == 0:
            assert row["via"] in (None, "None", "nan") or pd.isna(row["via"])
        else:
            assert df.loc[row["via"], "depth"] == row["depth"] - 1


def test_reach_driver_fast_path_equals_distributed(ray_session, monkeypatch):
    # fast path (default at this scale) vs the distributed per-round
    # dedup/min-combine loop forced via a zero driver bound
    fast_r = _norm(RCH.reachable_query(SF).to_pandas())
    fast_p = _norm(RCH.paths_query(SF).to_pandas())
    monkeypatch.setattr(RCH, "DRIVER_MAX_REACH_EDGES", 0)
    dist_r = _norm(RCH.reachable_query(SF).to_pandas())
    dist_p = _norm(RCH.paths_query(SF).to_pandas())
    pd.testing.assert_frame_equal(fast_r, dist_r, check_dtype=False)
    pd.testing.assert_frame_equal(fast_p, dist_p, check_dtype=False)
