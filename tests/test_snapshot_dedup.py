"""dedup_snapshot (incremental / cross-snapshot dedup) semantics.

Planted fixture: prior snapshot = doc_id % SNAPSHOT_MOD == 0; a new doc
duplicating a prior text must drop, new-vs-new duplicates must BOTH be
kept, and the result must be identical under a 64-bit Bloom (which turns
nearly every probe into a false positive and routes everything through
the exact anti-join) — correctness never depends on the filter.
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from joern_ray.pipelines import text as T


@pytest.fixture()
def planted_dir(tmp_path):
    # ids 0,5,10 are the prior snapshot; 1..4, 6..9 are new
    texts = {
        0: "alpha shared text",
        5: "beta prior only",
        10: "gamma prior only",
        1: "alpha shared text",      # dup of prior 0 → drop
        2: "delta new unique",       # keep
        3: "epsilon new dup",        # keep (new-vs-new dup)
        4: "epsilon new dup",        # keep (new-vs-new dup)
        6: "beta prior only",        # dup of prior 5 → drop
        7: "zeta new unique",        # keep
        8: "eta new unique",         # keep
        9: "theta new unique",       # keep
    }
    ids = sorted(texts)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([texts[i] for i in ids], pa.string())})
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _ids(ds):
    return sorted(pa.Table.from_pandas(ds.to_pandas())
                  .column("doc_id").to_pylist())


def test_snapshot_dedup_planted(planted_dir, ray_session):
    got = _ids(T.snapshot_dedup(planted_dir))
    assert got == [2, 3, 4, 7, 8, 9]


def test_snapshot_dedup_matches_sql_oracle(planted_dir, ray_session):
    got = _ids(T.snapshot_dedup(planted_dir))
    con = duckdb.connect()
    con.execute(f"create view documents as select * from "
                f"'{planted_dir}/documents.parquet'")
    want = sorted(r[0] for r in
                  con.execute(T.snapshot_dedup_sql()).fetchall())
    assert got == want


def test_snapshot_dedup_bloom_independent(planted_dir, ray_session):
    """A 64-bit Bloom makes ~every new doc a candidate — the exact
    anti-join must still produce the identical keep set."""
    assert (_ids(T.snapshot_dedup(planted_dir, bloom_bits=64))
            == _ids(T.snapshot_dedup(planted_dir)))
