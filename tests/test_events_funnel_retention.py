"""events_funnel / events_retention semantics on planted fixtures.

Funnel: min-ts chaining — a step-k event counts only if STRICTLY after
the user's step-(k-1) completion time (out-of-order purchases must not
count).  Retention: cohort = calendar day of the user's first event;
distinct active days only.  Both compared row-for-row against the DuckDB
oracle SQL on the same parquet (the driver's check, dtype-strict).
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from joern_ray.pipelines import events as EV

US = 1_000_000
DAY = 86400 * US


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


@pytest.fixture()
def funnel_dir(tmp_path):
    # user 1: full ordered funnel; user 2: purchase BEFORE click (stops
    # at step 2); user 3: click before any view (stops at step 1);
    # user 4: no view at all (reaches nothing)
    rows = [
        (1, 10 * US, "view"), (1, 20 * US, "click"), (1, 30 * US, "purchase"),
        (2, 10 * US, "view"), (2, 30 * US, "click"), (2, 20 * US, "purchase"),
        (3, 20 * US, "view"), (3, 10 * US, "click"),
        (4, 10 * US, "click"), (4, 20 * US, "purchase"),
    ]
    return _write_events(tmp_path, rows)


def _run(fn, sf_dir, sql):
    got = pa.Table.from_pandas(fn(sf_dir).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{sf_dir}/events.parquet'")
    want = con.execute(sql).fetch_arrow_table()
    keys = sorted(got.column_names)
    srt = [(k, "ascending") for k in keys]
    return got.select(keys).sort_by(srt), want.select(keys).sort_by(srt)


def test_funnel_order_sensitivity(funnel_dir, ray_session):
    got, want = _run(EV.funnel, funnel_dir, EV.funnel_sql())
    assert got.equals(want)
    by_step = dict(zip(got.column("step").to_pylist(),
                       got.column("n_users").to_pylist()))
    assert by_step == {1: 3, 2: 2, 3: 1}


def test_funnel_tie_does_not_advance(tmp_path, ray_session):
    # click at EXACTLY the view's ts must not advance (strictly-after)
    rows = [(1, 10 * US, "view"), (1, 10 * US, "click"),
            (1, 20 * US, "purchase")]
    d = _write_events(tmp_path, rows)
    got, want = _run(EV.funnel, d, EV.funnel_sql())
    assert got.equals(want)
    by_step = dict(zip(got.column("step").to_pylist(),
                       got.column("n_users").to_pylist()))
    assert by_step == {1: 1, 2: 0, 3: 0}


def test_retention_cohort_and_distinct_days(tmp_path, ray_session):
    # user 1: first event day 0, active days 0, 1, 3 (two events on
    # day 1 count once); user 2: first event day 1, active days 1, 2
    rows = [
        (1, 0 * DAY + 5 * US, "view"),
        (1, 1 * DAY + 5 * US, "click"), (1, 1 * DAY + 6 * US, "view"),
        (1, 3 * DAY + 5 * US, "purchase"),
        (2, 1 * DAY + 5 * US, "view"), (2, 2 * DAY + 5 * US, "click"),
    ]
    d = _write_events(tmp_path, rows)
    got, want = _run(EV.retention, d, EV.retention_sql())
    assert got.equals(want)
    trip = list(zip(got.column("cohort_day").to_pylist(),
                    got.column("day_offset").to_pylist(),
                    got.column("n_users").to_pylist()))
    assert ("1970-01-01", 0, 1) in trip
    assert ("1970-01-01", 1, 1) in trip
    assert ("1970-01-01", 3, 1) in trip
    assert ("1970-01-02", 0, 1) in trip
    assert ("1970-01-02", 1, 1) in trip
    assert len(trip) == 5
