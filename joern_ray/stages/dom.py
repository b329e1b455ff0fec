"""Dominator-tree / post-dominator / control-dependence operators.

Reference analogs: ``x2cpg/passes/controlflow/CfgDominatorPass.scala:17-48``
(per-method dominator + post-dominator trees via the Cooper-Harvey-Kennedy
iterative algorithm) and ``CdgPass.scala:22-60`` (CDG from the
post-dominance relation, Ferrante et al.).

Ray-Data-first shape: the graph key (conv_id) hash-partitions edge rows so
one conversation's graph lands in one group — the same partitioning
contract as pronoun resolution — and each group runs the sequential CHK
algorithm (graphs are conversation-sized: the per-method analog, NOT a
distributed fixpoint).  On the linear NEXT_TURN chains of real transcripts
the trees are degenerate (idom = predecessor); the operator is generic over
any per-conversation edge set (e.g. reply trees), tested on branching DAGs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DOM = pa.schema([
    ("conv_id", pa.string()),
    ("node", pa.string()),
    ("idom", pa.string()),          # null for the entry node
])

CDG = pa.schema([
    ("conv_id", pa.string()),
    ("ctrl", pa.string()),          # controlling node
    ("node", pa.string()),          # control-dependent node
])


def _idoms(nodes: list[str], succs: dict[str, list[str]],
           entry: str) -> dict[str, str | None]:
    """Cooper-Harvey-Kennedy iterative immediate-dominator computation."""
    # reverse post-order from entry
    order: list[str] = []
    seen = set()
    stack: list[tuple[str, int]] = [(entry, 0)]
    while stack:
        n, i = stack.pop()
        if i == 0:
            if n in seen:
                continue
            seen.add(n)
        ss = succs.get(n, [])
        if i < len(ss):
            stack.append((n, i + 1))
            stack.append((ss[i], 0))
        else:
            order.append(n)
    order.reverse()                      # RPO; unreachable nodes excluded
    rpo = {n: i for i, n in enumerate(order)}
    preds: dict[str, list[str]] = {n: [] for n in order}
    for n in order:
        for s in succs.get(n, []):
            if s in rpo:
                preds[s].append(n)
    idom: dict[str, str] = {entry: entry}

    def intersect(a: str, b: str) -> str:
        while a != b:
            while rpo[a] > rpo[b]:
                a = idom[a]
            while rpo[b] > rpo[a]:
                b = idom[b]
        return a

    changed = True
    while changed:
        changed = False
        for n in order:
            if n == entry:
                continue
            cand = [p for p in preds[n] if p in idom]
            if not cand:
                continue
            new = cand[0]
            for p in cand[1:]:
                new = intersect(new, p)
            if idom.get(n) != new:
                idom[n] = new
                changed = True
    out: dict[str, str | None] = {n: idom.get(n) for n in order}
    out[entry] = None
    return out


_VROOT = "\x00root"


def _group_graph(group: pa.Table, reverse: bool
                 ) -> tuple[str, list[str], dict[str, list[str]], str]:
    conv = group.column("conv_id")[0].as_py()
    srcs = group.column("src").to_pylist()
    dsts = group.column("dst").to_pylist()
    if reverse:
        srcs, dsts = dsts, srcs
    nodes = sorted(set(srcs) | set(dsts))
    succs: dict[str, list[str]] = {}
    for s, d in sorted(zip(srcs, dsts)):
        succs.setdefault(s, []).append(d)
    # entry = virtual root over all in-degree-0 nodes (deterministic; also
    # covers multi-entry graphs and cycles with no natural entry)
    has_in = set(dsts)
    roots = [n for n in nodes if n not in has_in] or [nodes[0]]
    succs[_VROOT] = roots
    return conv, nodes, succs, _VROOT


def _dom_table(group: pa.Table, reverse: bool) -> pa.Table:
    if group.num_rows == 0:
        return DOM.empty_table()
    conv, nodes, succs, entry = _group_graph(group, reverse)
    idom = _idoms(nodes + [entry], succs, entry)
    out_nodes = [n for n in nodes if n in idom]
    vals = [idom[n] for n in out_nodes]
    vals = [None if v == _VROOT else v for v in vals]
    return pa.Table.from_arrays(
        [pa.array([conv] * len(out_nodes), pa.string()),
         pa.array(out_nodes, pa.string()),
         pa.array(vals, pa.string())],
        schema=DOM)


def _edge_cols(edges_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Narrow the exchange to the three columns the algorithms read."""
    return edges_ds.map_batches(
        lambda t: t.select(["conv_id", "src", "dst"])
        if t.num_columns else t, batch_format="pyarrow")


_EDGE_IN = pa.schema([("conv_id", pa.string()), ("src", pa.string()),
                      ("dst", pa.string())])


def dominators(edges_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-conversation immediate-dominator table (CfgDominatorPass).

    Conversations co-locate into hash(conv_id) bucket shards; the
    sequential CHK algorithm runs as an in-shard loop over sorted
    conversation slices — one Ray group per bucket, never per key."""
    from ..functions.buckets import bucketed_group_map
    return bucketed_group_map(
        _edge_cols(edges_ds), "conv_id",
        lambda g: _dom_table(g, reverse=False), DOM, in_schema=_EDGE_IN)


def post_dominators(edges_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Immediate post-dominators = dominators of the reversed graph."""
    from ..functions.buckets import bucketed_group_map
    return bucketed_group_map(
        _edge_cols(edges_ds), "conv_id",
        lambda g: _dom_table(g, reverse=True), DOM, in_schema=_EDGE_IN)


def _cdg_table(group: pa.Table) -> pa.Table:
    """Ferrante control-dependence: for edge (u,v), walk v up the
    post-dominator tree until ipdom(u); every node passed is
    control-dependent on u (CdgPass.scala:22-60)."""
    if group.num_rows == 0:
        return CDG.empty_table()
    conv, nodes, rsuccs, rentry = _group_graph(group, reverse=True)
    ipdom = _idoms(nodes + [rentry], rsuccs, rentry)
    srcs = group.column("src").to_pylist()
    dsts = group.column("dst").to_pylist()
    deps: set[tuple[str, str]] = set()
    for u, v in zip(srcs, dsts):
        stop = ipdom.get(u)
        runner = v
        hops = 0
        while runner is not None and runner != stop \
                and runner != _VROOT and hops <= len(nodes):
            if runner != u:
                deps.add((u, runner))
            runner = ipdom.get(runner)
            hops += 1
    rows = sorted(deps)
    return pa.Table.from_arrays(
        [pa.array([conv] * len(rows), pa.string()),
         pa.array([a for a, _ in rows], pa.string()),
         pa.array([b for _, b in rows], pa.string())],
        schema=CDG)


def control_dependence(edges_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    from ..functions.buckets import bucketed_group_map
    return bucketed_group_map(
        _edge_cols(edges_ds), "conv_id", _cdg_table, CDG,
        in_schema=_EDGE_IN)
