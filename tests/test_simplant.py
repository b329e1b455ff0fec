"""Planted-corpus SimHash oracle family (r5).

The natural-corpus simhash entries are rows-only (blake2b over an
unbounded vocabulary is not SQL-expressible); the planted corpus bounds
the vocabulary to SIMPLANT_V tokens so the oracle can embed the
token→hash dictionary and reproduce the signature bit-for-bit in
integer-only SQL.  The cluster oracle's single-hop min-label is valid
only if the planted hamming-≤3 graph has no chains — the corpus is
deterministic, so the exhaustive assertions here hold forever.
"""

import duckdb
import numpy as np
import pyarrow as pa

from joern_ray.pipelines import text as T


def _py_docs() -> dict[int, str]:
    vocab = T._simplant_vocab()
    docs = {}
    for d in range(T.SIMPLANT_N_BASE):
        docs[d] = " ".join(vocab[i] for i in T._simplant_token_idx(d))
    for d in range(T.SIMPLANT_N_PAIR):
        toks = [vocab[i] for i in T._simplant_token_idx(d)]
        if d % 2 == 1:
            toks.append(vocab[(31 * d + T.SIMPLANT_C) % T.SIMPLANT_V])
        docs[d + T.SIMPLANT_OFFSET] = " ".join(toks)
    return docs


def _exhaustive_ham(sig: dict[int, int]):
    ids = sorted(sig)
    s = np.array([sig[i] for i in ids], dtype=np.int64).view(np.uint64)
    x = s[:, None] ^ s[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(ids), len(ids), 8),
                        axis=2).sum(axis=2)
    np.fill_diagonal(ham, 99)
    pairs = {(ids[i], ids[j])
             for i, j in zip(*np.nonzero(np.triu(ham <= 3, k=1)))}
    return ids, ham, pairs


def test_planted_structure_no_chains():
    """Exhaustive: the hamming-≤3 graph contains ONLY planted pairs
    (every even pair at hamming 0, most odd ones ≤3), max node degree 1
    (no chains — the single-hop SQL min-label precondition), and a
    ≥1-bit margin below every non-edge."""
    docs = _py_docs()
    sig = {i: T.simhash64(s) for i, s in docs.items()}
    ids, ham, pairs = _exhaustive_ham(sig)
    planted = {(d, d + T.SIMPLANT_OFFSET) for d in range(T.SIMPLANT_N_PAIR)}
    assert pairs <= planted
    even = {p for p in pairs if p[0] % 2 == 0}
    assert len(even) == T.SIMPLANT_N_PAIR // 2          # exact copies: all in
    assert len(pairs - even) >= T.SIMPLANT_N_PAIR // 4  # odd arm is exercised
    deg: dict[int, int] = {}
    for p in pairs:
        for v in p:
            deg[v] = deg.get(v, 0) + 1
    assert max(deg.values()) == 1
    nonedge = ham[(ham > 3) & (ham < 99)]
    assert nonedge.min() >= 4


def test_sql_signatures_match_scalar_kernel():
    """The SQL oracle reproduces simhash64 bit-for-bit over the whole
    planted corpus (integer-only: embedded hash dictionary, xorshift
    token arithmetic, signed bit-63 reassembly)."""
    docs = _py_docs()
    py_sig = {i: T.simhash64(s) for i, s in docs.items()}
    con = duckdb.connect()
    sql_sig = dict(con.sql(T.dedup_simhash_planted_sql()).fetchall())
    con.close()
    assert sql_sig == py_sig


def test_sql_clusters_match_expected():
    """The SQL cluster oracle equals the exhaustively computed connected
    components under lexicographic min-label."""
    docs = _py_docs()
    sig = {i: T.simhash64(s) for i, s in docs.items()}
    ids, _ham, pairs = _exhaustive_ham(sig)
    exp = {i: str(i) for i in ids}
    for a, b in pairs:
        lab = min(str(a), str(b))
        exp[a] = exp[b] = lab
    con = duckdb.connect()
    got = dict(con.sql(T.dedup_simhash_clusters_planted_sql()).fetchall())
    con.close()
    assert got == exp


def test_ray_planted_signatures_lockstep(ray_session):
    """simplant_docs → simhash_batch equals the scalar kernel (and hence
    the SQL oracle) for every planted doc."""
    docs = _py_docs()
    got = {}
    for b in T.dedup_simhash_planted("unused").iter_batches(
            batch_format="pyarrow"):
        got.update(zip(b.column("doc_id").to_pylist(),
                       b.column("simhash").to_pylist()))
    assert got == {i: T.simhash64(s) for i, s in docs.items()}


def test_ray_planted_clusters_lockstep(ray_session):
    """The full banded pipeline (_simhash_clusters_core) over the planted
    corpus equals the SQL oracle row-for-row — banding recall is exact by
    pigeonhole, so LSH vs all-pairs must agree."""
    got = {}
    for b in T.dedup_simhash_clusters_planted("unused").iter_batches(
            batch_format="pyarrow"):
        got.update(zip(b.column("doc_id").to_pylist(),
                       b.column("cluster").to_pylist()))
    con = duckdb.connect()
    exp = dict(con.sql(T.dedup_simhash_clusters_planted_sql()).fetchall())
    con.close()
    assert got == exp
