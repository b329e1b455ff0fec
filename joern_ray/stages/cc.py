"""Distributed connected components via iterative min-label propagation.

The canonicalization analog of the reference's inheritance-closure /
stub-dedup machinery (``DynamicCallLinker.scala:82-126`` closure caches;
``TypeDeclStubCreator`` exact dedup): union-find over coreference edges,
expressed as a bounded-iteration Dataset loop — each round propagates the
current minimum label across edges and re-aggregates with
``groupby(node).min(label)``; the loop exits on convergence, mirroring the
reference's deliberate bounded-iteration type recovery
(``XTypeRecovery.scala:23-41`` — "avoid the poor scalability of a fixed-point
algorithm").

Message propagation strategies (auto-selected by label-table size):
- ``broadcast``: the label table is `ray.put` once per round and read from
  the local object store inside every map task — the small-side-broadcast
  pattern (no shuffle per round beyond the min-label groupby).
- ``cogroup``: union of tagged (label | edge) rows + one groupby per round —
  fully distributed, no driver-side materialization, for label tables too
  large to broadcast.

(A third option, ``Dataset.join`` per round, is deliberately avoided: Ray
2.49's hash-shuffle join breaks on the schemaless empty partition blocks
that iterated aggregate pipelines produce.)

Convergence is detected with an order-insensitive checksum of the label
table (a shuffle-free reduce), not a self-join.

Determinism: min-label with lexicographic tie-break, independent of
partitioning (reference precedent: LinkedHashSet reproducibility,
``DynamicCallLinker.scala:28-31``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min

_LABELS = pa.schema([("node", pa.string()), ("label", pa.string())])
_MSG_IN = pa.schema([("node", pa.string()), ("b", pa.string()),
                     ("label", pa.string())])

BROADCAST_MAX_LABELS = 2_000_000
# below this node count the component computation runs driver-side in one
# pass (the reference precedent: DynamicCallLinker's in-memory closure
# caches / "driver loop over small types table", SURVEY.md §2.10) — the
# distributed round loop only pays off once the label table is too big to
# hold in one process.
DRIVER_MAX_NODES = 200_000


def _checksum_batch(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        return pa.table({"h": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    df = t.select(["node", "label"]).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype="uint64")
    xor = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
    return pa.table({"h": pa.array([int(xor) - (1 << 63)], pa.int64()),
                     "n": pa.array([len(h)], pa.int64())})


def _labels_checksum(labels: "ray.data.Dataset") -> tuple[int, int]:
    rows = labels.map_batches(_checksum_batch, batch_format="pyarrow").take_all()
    return (sum(r["h"] for r in rows), sum(r["n"] for r in rows))


def _msgs_broadcast(sym: "ray.data.Dataset", labels: "ray.data.Dataset"):
    # Broadcast parallel (node, label) Arrow arrays once (`ray.put`), then
    # resolve each edge batch with ONE vectorized `pc.index_in` + `take` —
    # the same kernel discipline as ``pagerank._factorize`` — instead of a
    # per-row Python dict map.
    def _concat(parts: list) -> pa.Array:
        chunks: list[pa.Array] = []
        for p in parts:
            chunks.extend(p.chunks if isinstance(p, pa.ChunkedArray) else [p])
        return (pa.concat_arrays(chunks) if chunks
                else pa.array([], pa.string()))

    node_parts, label_parts = [], []
    for batch in labels.iter_batches(batch_format="pyarrow"):
        if batch.num_columns and batch.num_rows:
            node_parts.append(batch.column("node"))
            label_parts.append(batch.column("label"))
    ref = ray.put((_concat(node_parts), _concat(label_parts)))

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _LABELS.empty_table()
        nodes, labs = ray.get(ref)
        idx = pc.index_in(t.column("a"), value_set=nodes)
        mask = pc.is_valid(idx)
        hit_idx = idx.filter(mask) if isinstance(idx, pa.ChunkedArray) \
            else pa.chunked_array([idx]).filter(mask)
        if len(hit_idx) == 0:
            return _LABELS.empty_table()
        return pa.table({
            "node": t.column("b").filter(mask),
            "label": labs.take(hit_idx.combine_chunks()),
        })

    return sym.map_batches(fn, batch_format="pyarrow")


COGROUP_BUCKETS = 256


def _msgs_cogroup(sym: "ray.data.Dataset", labels: "ray.data.Dataset",
                  *, n_buckets: int = COGROUP_BUCKETS):
    """Fully distributed message pass, bucketed shard-wise: label rows and
    edge rows co-locate by hash(node) bucket — NOT per-node groups — and
    each shard resolves with ONE vectorized Acero inner join (the
    ``materialize._cogroup_resolve_pass`` discipline).  This is the
    designated >BROADCAST_MAX_LABELS escape path, exactly the regime where
    per-key Python groups would hurt most."""
    import pandas as pd

    def _bucket(arr) -> pa.Array:
        h = pd.util.hash_array(arr.to_numpy(zero_copy_only=False))
        return pa.array((h % n_buckets).astype("int64"))

    union_schema = pa.schema(list(_MSG_IN) + [("bucket", pa.int64())])

    def tag_label(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return union_schema.empty_table()
        n = t.num_rows
        return pa.table({"node": t.column("node"),
                         "b": pa.nulls(n, pa.string()),
                         "label": t.column("label"),
                         "bucket": _bucket(t.column("node"))})

    def tag_edge(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return union_schema.empty_table()
        n = t.num_rows
        return pa.table({"node": t.column("a"), "b": t.column("b"),
                         "label": pa.nulls(n, pa.string()),
                         "bucket": _bucket(t.column("a"))})

    def emit_shard(g: pa.Table) -> pa.Table:
        is_lab = pc.is_valid(g.column("label"))
        labs = g.filter(is_lab).select(["node", "label"])
        edges = g.filter(pc.invert(is_lab)).select(["node", "b"])
        if labs.num_rows == 0 or edges.num_rows == 0:
            return _LABELS.empty_table()
        joined = edges.join(labs, keys=["node"], join_type="inner")
        return pa.table({
            "node": joined.column("b").combine_chunks().cast(pa.string()),
            "label": joined.column("label").combine_chunks()
            .cast(pa.string())})

    tagged = labels.map_batches(tag_label, batch_format="pyarrow").union(
        sym.map_batches(tag_edge, batch_format="pyarrow"))
    return tagged.groupby("bucket").map_groups(
        emit_shard, batch_format="pyarrow")


def _cc_driver(edges_ds: "ray.data.Dataset", labels: "ray.data.Dataset"
               ) -> "ray.data.Dataset":
    """Single-process union-find over a small node/edge set.

    Path compression + union-by-min-label; the final label is the
    lexicographic minimum of each component — identical, by construction,
    to the fixpoint of distributed min-label propagation."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for b in labels.iter_batches(batch_format="pyarrow"):
        if b.num_columns:
            for n in b.column("node").to_pylist():
                parent[n] = n
    for b in edges_ds.iter_batches(batch_format="pyarrow"):
        if b.num_columns == 0:
            continue
        for a, c in zip(b.column("a").to_pylist(), b.column("b").to_pylist()):
            if a not in parent:
                parent[a] = a
            if c not in parent:
                parent[c] = c
            ra, rc = find(a), find(c)
            if ra != rc:
                lo, hi = (ra, rc) if ra < rc else (rc, ra)
                parent[hi] = lo
    nodes = sorted(parent)
    out = pa.table({"node": pa.array(nodes, pa.string()),
                    "label": pa.array([find(n) for n in nodes], pa.string())})
    return ray.data.from_arrow(out)


def connected_components(
    edges_ds: "ray.data.Dataset",
    nodes_ds: "ray.data.Dataset",
    *,
    max_iters: int = 12,
    num_partitions: int = 8,
    strategy: str = "auto",
) -> "ray.data.Dataset":
    """edges: columns (a, b), undirected; nodes: column (node).

    Returns a Dataset (node, label): label = lexicographically smallest node
    key in the component.  ``max_iters`` bounds rounds (needs >= component
    diameter for full convergence; alias clusters here are tiny).

    strategy: 'auto' | 'driver' | 'broadcast' | 'cogroup'.  'auto' picks
    'driver' for small label tables (one-pass union-find, no per-round
    barriers) and escalates to the distributed round loop beyond
    DRIVER_MAX_NODES / BROADCAST_MAX_LABELS.
    """
    def swap(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("b"), batch.column("a")], names=["a", "b"])

    labels = nodes_ds.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("node"), b.column("node")], names=["node", "label"]),
        batch_format="pyarrow").materialize()

    if strategy == "auto":
        n_nodes = labels.count()
        strategy = ("driver" if n_nodes <= DRIVER_MAX_NODES
                    else "broadcast" if n_nodes <= BROADCAST_MAX_LABELS
                    else "cogroup")
    if strategy == "driver":
        return _cc_driver(edges_ds, labels)

    sym = edges_ds.union(
        edges_ds.map_batches(swap, batch_format="pyarrow")).materialize()
    prev = _labels_checksum(labels)
    msgs_fn = _msgs_broadcast if strategy == "broadcast" else _msgs_cogroup

    for _ in range(max_iters):
        msgs = msgs_fn(sym, labels)
        labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min(on="label", alias_name="label"))
            .repartition(num_partitions)
        ).materialize()
        cur = _labels_checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels
