"""PageRank over the entity FACT graph — the iterative graph-centrality
operator (SURVEY §2.10 family; the reference's closest analogs are the
bounded-iteration passes and the engine's task-parallel traversals).

Scale shape: the ENTITY set is vocabulary-sized (≪ corpus), so the node
index and rank vector broadcast each round (`ray.put` once per iteration);
the EDGE multiset is corpus-sized and is factorized ONCE into int node
ids (materialized), after which every iteration is pure numpy per batch —
`bincount` of contributions — emitting sparse per-batch partials that the
driver folds (|vocab|-bounded, canonically sorted so float accumulation
order, hence the result, is deterministic).  Same loop discipline as
frontier BFS (`reach.py`) and k-means (`ann.py`)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions import rules as R
from .link import normalize_arrays

DAMPING = 0.85
PAGERANK_ITERS = 15

# Beyond this node count the per-iteration contribution fold runs as a
# DISTRIBUTED groupby("i").sum() (driver receives at most one row per
# distinct dst node, i.e. ≤ |vocab| pre-summed rows) instead of the
# driver-side fold over every block's raw sparse partials — the same
# guard-constant + distributed-escape discipline as ``reach.py`` /
# ``cc.DRIVER_MAX_NODES``.  The rank vector itself stays driver-held and
# broadcast per round; it is vocabulary-sized BY CONSTRUCTION (conv
# natural keys are excluded from the node universe in `_entity_edges`).
DRIVER_MAX_PAGERANK_NODES = 2_000_000

_NONLINK_ARR = pa.array(sorted(R.NONLINK_KINDS))


def _entity_edges(triples_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Triples → directed weighted (src, dst, w) composite-key edge rows
    (kind:norm, normalized; per-batch combined).

    Natural-key NONLINK kinds ('conv') are excluded from BOTH slots: they
    are corpus-sized, not vocabulary-sized, and would grow the driver-side
    node index / per-iteration rank broadcast with the corpus — the
    module's stated 100-TB shape requires an entity-vocabulary node set."""
    def fn(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.invert(pc.is_in(t.column("subj_kind"),
                               value_set=_NONLINK_ARR)),
            pc.invert(pc.is_in(t.column("obj_kind"),
                               value_set=_NONLINK_ARR)))
        t = t.filter(keep)
        src = pc.binary_join_element_wise(
            pc.cast(t.column("subj_kind"), pa.string()),
            normalize_arrays(t.column("subj_kind"), t.column("subj")), ":")
        dst = pc.binary_join_element_wise(
            pc.cast(t.column("obj_kind"), pa.string()),
            normalize_arrays(t.column("obj_kind"), t.column("obj")), ":")
        out = pa.table({"src": src, "dst": dst})
        return (out.group_by(["src", "dst"]).aggregate([("dst", "count")])
                .rename_columns(["src", "dst", "w"]))
    return triples_ds.map_batches(fn, batch_format="pyarrow")


def _fold_dense(parts_ds: "ray.data.Dataset", n: int,
                distributed: bool) -> np.ndarray:
    """Fold a Dataset of sparse (i, c) partials into a dense length-n
    vector.  Driver path: take_all the raw per-batch partials and
    accumulate in canonical (i, c) order (deterministic float order).
    Distributed path (> DRIVER_MAX_PAGERANK_NODES): one
    ``groupby("i").sum("c")`` exchange first, so the driver pulls at most
    one pre-summed row per node — never blocks × nnz rows.  The two paths
    differ only in float association order; equivalence is tested."""
    if distributed:
        from ray.data.aggregate import Sum
        parts = (parts_ds.groupby("i")
                 .aggregate(Sum(on="c", alias_name="c")).take_all())
    else:
        parts = parts_ds.take_all()
    out = np.zeros(n)
    for r in sorted(parts, key=lambda r: (r["i"], r["c"])):
        out[r["i"]] += r["c"]
    return out


def pagerank(triples_ds: "ray.data.Dataset", *, iters: int = PAGERANK_ITERS,
             damping: float = DAMPING,
             driver_max_nodes: int = DRIVER_MAX_PAGERANK_NODES
             ) -> "ray.data.Dataset":
    """(entity, rank) — weighted PageRank on the mention-fact multigraph."""
    edges = _entity_edges(triples_ds).materialize()

    # vocabulary (node set): distinct endpoints via per-batch combiner
    node_parts = edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t.column("src").combine_chunks().cast(pa.string()),
            t.column("dst").combine_chunks().cast(pa.string())])})
        .group_by("node").aggregate([]),
        batch_format="pyarrow").take_all()
    nodes = sorted({r["node"] for r in node_parts})
    n = len(nodes)
    if n == 0:
        return ray.data.from_arrow(pa.schema(
            [("entity", pa.string()), ("rank", pa.float64())]).empty_table())
    # factorize corpus-sized edges with ONE vectorized hash-lookup kernel
    # per batch (pc.index_in against the broadcast sorted node array) —
    # never a Python dict lookup per edge row
    nref = ray.put(pa.array(nodes, pa.string()))

    def to_idx(t: pa.Table) -> pa.Table:
        nodes_ = ray.get(nref)
        si = pc.index_in(t.column("src").cast(pa.string()),
                         value_set=nodes_).cast(pa.int64())
        di = pc.index_in(t.column("dst").cast(pa.string()),
                         value_set=nodes_).cast(pa.int64())
        return pa.table({"si": si, "di": di,
                         "w": t.column("w").cast(pa.float64())})

    iedges = edges.map_batches(to_idx, batch_format="pyarrow").materialize()
    distributed_fold = n > driver_max_nodes

    # weighted out-degree vector: sparse per-batch bincounts, then the
    # bounded fold (driver below the guard, groupby-sum exchange above)
    ow = _fold_dense(
        iedges.map_batches(
            lambda t: _sparse(np.bincount(t.column("si").to_numpy(),
                                          weights=t.column("w").to_numpy(),
                                          minlength=n)),
            batch_format="pyarrow"),
        n, distributed_fold)

    ranks = np.full(n, 1.0 / n)
    for _ in range(iters):
        rref = ray.put((ranks, ow))

        def contrib(t: pa.Table, _r=rref) -> pa.Table:
            rk, ow_ = ray.get(_r)
            si = t.column("si").to_numpy()
            di = t.column("di").to_numpy()
            w = t.column("w").to_numpy()
            valid = ow_[si] > 0
            c = np.zeros(len(si))
            c[valid] = rk[si[valid]] * w[valid] / ow_[si[valid]]
            return _sparse(np.bincount(di, weights=c, minlength=len(rk)))

        agg = _fold_dense(
            iedges.map_batches(contrib, batch_format="pyarrow"),
            n, distributed_fold)
        dangling = ranks[ow == 0].sum()
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = base + damping * agg

    return ray.data.from_arrow(pa.table({
        "entity": pa.array(nodes, pa.string()),
        "rank": pa.array(ranks, pa.float64())}))


def _sparse(vec: np.ndarray) -> pa.Table:
    nz = np.nonzero(vec)[0]
    return pa.table({"i": pa.array(nz, pa.int64()),
                     "c": pa.array(vec[nz], pa.float64())})


def pagerank_query(sf_dir: str):
    from .. import synth
    from .extract import extract_triples
    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    return pagerank(extract_triples(tds))
