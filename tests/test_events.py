"""Event-stream operators vs a DuckDB oracle on sf0.001."""

import duckdb
import pandas as pd
import pytest

from joern_ray.pipelines import events as EV

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
    return c


@pytest.mark.parametrize("fn,sql", [
    (EV.sessionize, EV.sessionize_sql),
    (EV.window_counts, EV.window_counts_sql),
    (EV.asof_prior_view, EV.asof_prior_view_sql),
])
def test_events_op_matches_oracle(ray_session, con, fn, sql):
    got = _norm(fn(SF).to_pandas())
    want = _norm(con.execute(sql()).fetchdf())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sliding_counts_mass_conservation(ray_session, sf_small):
    """Every event lands in exactly SLIDE_FACTOR sliding windows, so the
    sliding-count total is exactly SLIDE_FACTOR x the event count."""
    import ray

    from joern_ray.pipelines import events as EV

    n_events = ray.data.read_parquet(EV._p(sf_small)).count()
    df = EV.sliding_window_counts(sf_small).to_pandas()
    assert df["n_events"].sum() == EV.SLIDE_FACTOR * n_events
    # window starts advance on the slide grid
    assert (df["window_start"].astype("int64")
            % (EV.SLIDE_S * 1_000_000) == 0).all()
