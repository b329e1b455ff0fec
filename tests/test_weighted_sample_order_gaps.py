"""text_sample_weighted / rel_order_gaps semantics on planted fixtures
plus DuckDB oracle parity (the driver's check, dtype-strict)."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from joern_ray.pipelines import relational as REL
from joern_ray.pipelines import text as T

US = 1_000_000
DAY = 86400 * US


def test_sample_weighted_prefers_heavy_docs(tmp_path, ray_session):
    """Two docs with IDENTICAL hash priority base (doc_id and
    doc_id + 2^32 hash identically under the mod-2^32 multiplicative
    hash): the heavier doc (larger n_chars divisor) must win the single
    sample slot."""
    light, heavy = 7, 7 + 2 ** 32
    t = pa.table({"doc_id": pa.array([light, heavy], pa.int64()),
                  "text": pa.array(["a", "b"], pa.string()),
                  "lang": pa.array(["en", "en"], pa.string()),
                  "source": pa.array(["s", "s"], pa.string()),
                  "n_chars": pa.array([10, 1000], pa.int64())})
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    got = T.sample_weighted(str(tmp_path), k=1).to_pandas()
    assert got["doc_id"].tolist() == [heavy]


def test_sample_weighted_matches_sql(tmp_path, ray_session):
    ids = list(range(1, 60))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(["x"] * len(ids), pa.string()),
                  "lang": pa.array(["en"] * len(ids), pa.string()),
                  "source": pa.array(["s"] * len(ids), pa.string()),
                  "n_chars": pa.array([(i * 37) % 500 + 1 for i in ids],
                                      pa.int64())})
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    got = pa.Table.from_pandas(
        T.sample_weighted(str(tmp_path), k=10).to_pandas())
    con = duckdb.connect()
    con.execute(f"create view documents as select * from "
                f"'{tmp_path}/documents.parquet'")
    want = con.execute(T.sample_weighted_sql(k=10)).fetch_arrow_table()
    keys = sorted(got.column_names)
    srt = [(k, "ascending") for k in keys]
    assert got.select(keys).sort_by(srt).equals(
        want.select(keys).sort_by(srt))


@pytest.fixture()
def orders_dir(tmp_path):
    # cust 1: orders on days 0, 3, 10 → gaps 3, 7 (avg 5000 milli, max 7)
    # cust 2: single order → excluded
    # cust 3: two orders same calendar day → gap 0
    rows = [
        (100, 1, 0 * DAY + 5 * US), (101, 1, 3 * DAY + 8 * US),
        (102, 1, 10 * DAY + 2 * US),
        (200, 2, 4 * DAY),
        (300, 3, 6 * DAY + 1 * US), (301, 3, 6 * DAY + 9 * US),
    ]
    t = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([10.0] * len(rows), pa.float64()),
        "o_orderdate": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * len(rows), pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "orders.parquet"))
    return str(tmp_path)


def test_order_gaps_planted(orders_dir, ray_session):
    got = REL.order_gaps(orders_dir).to_pandas().set_index("custkey")
    assert sorted(got.index) == [1, 3]
    assert got.loc[1, "n_orders"] == 3
    assert got.loc[1, "avg_gap_days_milli"] == 5000
    assert got.loc[1, "max_gap_days"] == 7
    assert got.loc[3, "avg_gap_days_milli"] == 0
    assert got.loc[3, "max_gap_days"] == 0


def test_order_gaps_matches_sql(orders_dir, ray_session):
    got = pa.Table.from_pandas(REL.order_gaps(orders_dir).to_pandas())
    con = duckdb.connect()
    con.execute(f"create view orders as select * from "
                f"'{orders_dir}/orders.parquet'")
    want = con.execute(REL.order_gaps_sql()).fetch_arrow_table()
    keys = sorted(got.column_names)
    srt = [(k, "ascending") for k in keys]
    assert got.select(keys).sort_by(srt).equals(
        want.select(keys).sort_by(srt))
