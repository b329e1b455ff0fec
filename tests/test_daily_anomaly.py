"""events_daily_anomaly semantics: integer-exact z²-milli outlier scores
over per-(event_type, day) counts, planted spike + DuckDB parity."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from joern_ray.pipelines import events as EV

US = 1_000_000
DAY = 86400 * US


@pytest.fixture()
def planted_dir(tmp_path):
    # 'click': 1 event on each of days 0..3, then a 10-event spike on
    # day 4.  'view': constant 2/day over 3 days (variance 0 → z² = 0).
    rows = []
    for d in range(4):
        rows.append(("click", d * DAY + 5 * US))
    for i in range(10):
        rows.append(("click", 4 * DAY + (i + 1) * US))
    for d in range(3):
        rows.extend([("view", d * DAY + 1 * US), ("view", d * DAY + 2 * US)])
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_daily_anomaly_planted(planted_dir, ray_session):
    got = EV.daily_anomaly(planted_dir).to_pandas()
    click = got[got.event_type == "click"].set_index("day")
    # c=5, s=14, ss=104: den = 5*104 - 196 = 324
    # spike day: dev = 10*5 - 14 = 36 → z² milli = 1000*1296 // 324 = 4000
    assert click.loc["1970-01-05", "z2_milli"] == 4000
    # ordinary day: dev = 5 - 14 = -9 → 1000*81 // 324 = 250
    assert click.loc["1970-01-01", "z2_milli"] == 250
    view = got[got.event_type == "view"]
    assert set(view.z2_milli) == {0}          # zero variance → all 0


def test_daily_anomaly_matches_sql(planted_dir, ray_session):
    got = pa.Table.from_pandas(EV.daily_anomaly(planted_dir).to_pandas())
    con = duckdb.connect()
    con.execute(f"create view events as select * from "
                f"'{planted_dir}/events.parquet'")
    want = con.execute(EV.daily_anomaly_sql()).fetch_arrow_table()
    keys = sorted(got.column_names)
    srt = [(k, "ascending") for k in keys]
    assert got.select(keys).sort_by(srt).equals(
        want.select(keys).sort_by(srt))
