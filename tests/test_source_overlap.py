"""text_source_overlap semantics: exact pairwise Jaccard between sources
over DISTINCT token sets, planted fixture + DuckDB oracle parity."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from joern_ray.pipelines import text as T


@pytest.fixture()
def planted_dir(tmp_path):
    # srcA tokens {a b c d}; srcB {c d e f}; srcC {x}
    # A∩B = {c d} → 2/6; A∩C = B∩C = ∅ (no row emitted)
    docs = [
        (0, "a b c", "srcA"), (1, "c d d", "srcA"),
        (2, "c d e", "srcB"), (3, "e f", "srcB"),
        (4, "x x x", "srcC"),
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array([d[2] for d in docs], pa.string()),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    })
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_source_overlap_planted(planted_dir, ray_session):
    got = pa.Table.from_pandas(
        T.source_overlap(planted_dir).to_pandas())
    rows = {(a, b): (c, u, j) for a, b, c, u, j in zip(
        got.column("source_a").to_pylist(),
        got.column("source_b").to_pylist(),
        got.column("n_common").to_pylist(),
        got.column("n_union").to_pylist(),
        got.column("jaccard_ppm").to_pylist())}
    assert rows == {("srcA", "srcB"): (2, 6, 2_000_000 // 6)}


def test_source_overlap_matches_sql(planted_dir, ray_session):
    got = pa.Table.from_pandas(
        T.source_overlap(planted_dir).to_pandas())
    con = duckdb.connect()
    con.execute(f"create view documents as select * from "
                f"'{planted_dir}/documents.parquet'")
    want = con.execute(T.source_overlap_sql()).fetch_arrow_table()
    keys = sorted(got.column_names)
    srt = [(k, "ascending") for k in keys]
    assert got.select(keys).sort_by(srt).equals(
        want.select(keys).sort_by(srt))
