"""Bounded multi-hop reachability over the fact graph — the interprocedural
``reachableBy`` analog (SURVEY.md §2.10; reference:
``dataflowengineoss/.../queryengine/Engine.scala:23-150``: task-parallel
frontier expansion, memoized by fingerprint, call-depth capped at
``JoernScan.scala:101-103``).

Expressed as the frontier-BFS Dataset pattern: a driver-controlled loop of
per-batch hash-join expansions against a broadcast frontier, an anti-join
against the seen-set as the memo, and a hop cap as the depth bound.  The
frontier/seen sets here are entity-vocabulary-sized (≪ corpus), so they
broadcast; a corpus-sized frontier would switch the expansion to a
distributed groupby cogroup — same loop shape.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .extract import extract_triples
from .link import normalize_arrays

REACH = pa.schema([
    ("kind", pa.string()),
    ("norm", pa.string()),
    ("depth", pa.int32()),
])

PATHS = pa.schema([
    ("kind", pa.string()),
    ("norm", pa.string()),
    ("depth", pa.int32()),
    ("via", pa.string()),            # null for seeds
])


def _norm_edges(triples_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Triples → undirected (kind, norm) adjacency rows (narrow)."""
    def fn(t: pa.Table) -> pa.Table:
        sk, ok = t.column("subj_kind"), t.column("obj_kind")
        sn = normalize_arrays(sk, t.column("subj"))
        on = normalize_arrays(ok, t.column("obj"))
        fwd = pa.table({"a_kind": sk, "a_norm": sn,
                        "b_kind": ok, "b_norm": on})
        rev = pa.table({"a_kind": ok, "a_norm": on,
                        "b_kind": sk, "b_norm": sn})
        both = pa.concat_tables([fwd, rev])
        return both.group_by(list(both.schema.names)).aggregate([])
    return triples_ds.map_batches(fn, batch_format="pyarrow")


# Driver fast path bound: when the deduped edge table is at most this many
# rows (entity-VOCABULARY-pair-sized, ≪ corpus), the whole BFS runs on the
# driver off one collect — zero per-round exchange latency.  Beyond it the
# per-round distributed dedup/min-combine path runs (the corpus-scale
# shape).  Same discipline as the MinHash driver fast path
# (text.DRIVER_MAX_DOCS) and the broadcast bound
# (materialize.BROADCAST_MAX_ENTITIES); equivalence is pytest-asserted.
DRIVER_MAX_REACH_EDGES = 200_000


def _collect_small_edges(edges: "ray.data.Dataset") -> list | None:
    """Edge rows if the materialized edge table is under the driver bound,
    else None (cross-batch duplicates are deduped here)."""
    if edges.count() > DRIVER_MAX_REACH_EDGES:
        return None
    seen = set()
    for r in edges.take_all():
        seen.add((r["a_kind"], r["a_norm"], r["b_kind"], r["b_norm"]))
    return sorted(seen)


def _driver_bfs(edge_rows: list, seeds: list[tuple[str, str]],
                max_depth: int, with_via: bool) -> dict:
    """Serial BFS over a collected edge list — byte-identical semantics to
    the distributed loop: per-depth frontier, min-via tie-break."""
    adj: dict[tuple[str, str], list] = {}
    for ak, an, bk, bn in edge_rows:
        adj.setdefault((ak, an), []).append((bk, bn))
    seen: dict = {s: (0, None) for s in seeds}
    frontier = set(seeds)
    for depth in range(1, max_depth + 1):
        cand: dict = {}
        for (ak, an) in frontier:
            via = f"{ak}:{an}"
            for nb in adj.get((ak, an), ()):
                if nb in seen:
                    continue
                if nb not in cand or via < cand[nb]:
                    cand[nb] = via
        if not cand:
            break
        for nb, via in cand.items():
            seen[nb] = (depth, via if with_via else None)
        frontier = set(cand)
    return seen


def reachable(triples_ds: "ray.data.Dataset", seeds: list[tuple[str, str]],
              *, max_depth: int = 3,
              extra_flows: list[tuple[str, str, str, str]] | None = None
              ) -> "ray.data.Dataset":
    """BFS from seed (kind, norm) pairs; returns (kind, norm, depth) with
    the minimum hop distance ≤ max_depth (seeds at depth 0).

    extra_flows: externally-loaded (a_kind, a_norm, b_kind, b_norm) edges
    (state.config.Semantics.extra_flows) unioned — both directions — onto
    the extracted edge set before BFS, the ``extraFlows`` merge of
    ``OssDataFlow.scala:15-18``."""
    edges = _norm_edges(triples_ds)
    if extra_flows:
        rows = [(a, b, c, d) for a, b, c, d in extra_flows]
        rows += [(c, d, a, b) for a, b, c, d in extra_flows]
        extra = pa.table({
            "a_kind": pa.array([r[0] for r in rows], pa.string()),
            "a_norm": pa.array([r[1] for r in rows], pa.string()),
            "b_kind": pa.array([r[2] for r in rows], pa.string()),
            "b_norm": pa.array([r[3] for r in rows], pa.string())})
        edges = edges.union(ray.data.from_arrow(extra))
    edges = edges.materialize()
    small = _collect_small_edges(edges)
    if small is not None:
        bfs = _driver_bfs(small, seeds, max_depth, with_via=False)
        out = sorted((kn, d) for kn, (d, _v) in bfs.items())
        return ray.data.from_arrow(pa.table({
            "kind": pa.array([k for (k, _), _d in out], pa.string()),
            "norm": pa.array([n for (_, n), _d in out], pa.string()),
            "depth": pa.array([d for _kn, d in out], pa.int32()),
        }).cast(REACH))
    seen: dict[tuple[str, str], int] = {s: 0 for s in seeds}
    frontier = set(seeds)
    for depth in range(1, max_depth + 1):
        # broadcast the frontier as a composite-key Arrow array: membership
        # is one vectorized pc.is_in kernel per batch, never a Python loop
        fkeys = pa.array([f"{k}\x1f{n}" for k, n in sorted(frontier)],
                         pa.string())
        fref = ray.put(fkeys)

        def expand(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return pa.table({"kind": pa.array([], pa.string()),
                                 "norm": pa.array([], pa.string())})
            fr = ray.get(fref)
            key = pc.binary_join_element_wise(
                pc.cast(t.column("a_kind"), pa.string()),
                pc.cast(t.column("a_norm"), pa.string()), "\x1f")
            sub = t.filter(pc.is_in(key, value_set=fr))
            out = sub.select(["b_kind", "b_norm"]).rename_columns(
                ["kind", "norm"])
            return out.group_by(["kind", "norm"]).aggregate([])

        # distributed global dedup BEFORE the driver sees anything: the
        # collected next-frontier is vocabulary-sized by construction
        nxt_rows = (edges.map_batches(expand, batch_format="pyarrow")
                    .groupby(["kind", "norm"]).count()
                    .take_all())
        nxt = {(r["kind"], r["norm"]) for r in nxt_rows}
        frontier = nxt - seen.keys()          # anti-join memo
        if not frontier:
            break
        for k in frontier:
            seen[k] = depth
    out = sorted(seen.items())
    return ray.data.from_arrow(pa.table({
        "kind": pa.array([k for (k, _), _d in out], pa.string()),
        "norm": pa.array([n for (_, n), _d in out], pa.string()),
        "depth": pa.array([d for _kn, d in out], pa.int32()),
    }).cast(REACH))


def reachable_paths(triples_ds: "ray.data.Dataset",
                    seeds: list[tuple[str, str]], *, max_depth: int = 3
                    ) -> "ray.data.Dataset":
    """``reachable`` with a path WITNESS: for every reached node, also the
    predecessor ("kind:norm") it was first reached through — the
    lexicographically smallest frontier predecessor, a deterministic
    choice independent of partitioning.  The per-element path-evidence
    analog of the reference engine's result paths
    (``Engine.scala:120-150``, ``TaskSolver.scala``): following ``via``
    links walks an actual shortest path back to a seed.

    Same loop shape as ``reachable`` (broadcast frontier, per-batch
    vectorized expansion, distributed min-combine BEFORE the driver sees
    anything); the exchange carries one extra narrow string column."""
    from ray.data.aggregate import Min

    edges = _norm_edges(triples_ds).materialize()
    small = _collect_small_edges(edges)
    if small is not None:
        bfs = _driver_bfs(small, seeds, max_depth, with_via=True)
        out = sorted(bfs.items())
        return ray.data.from_arrow(pa.table({
            "kind": pa.array([k for (k, _), _dv in out], pa.string()),
            "norm": pa.array([n for (_, n), _dv in out], pa.string()),
            "depth": pa.array([d for _kn, (d, _v) in out], pa.int32()),
            "via": pa.array([v for _kn, (_d, v) in out], pa.string()),
        }).cast(PATHS))
    seen: dict[tuple[str, str], tuple[int, str | None]] = {
        s: (0, None) for s in seeds}
    frontier = set(seeds)
    for depth in range(1, max_depth + 1):
        fkeys = pa.array([f"{k}\x1f{n}" for k, n in sorted(frontier)],
                         pa.string())
        fref = ray.put(fkeys)

        def expand(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return pa.table({"kind": pa.array([], pa.string()),
                                 "norm": pa.array([], pa.string()),
                                 "via": pa.array([], pa.string())})
            fr = ray.get(fref)
            key = pc.binary_join_element_wise(
                pc.cast(t.column("a_kind"), pa.string()),
                pc.cast(t.column("a_norm"), pa.string()), "\x1f")
            sub = t.filter(pc.is_in(key, value_set=fr))
            via = pc.binary_join_element_wise(
                pc.cast(sub.column("a_kind"), pa.string()),
                pc.cast(sub.column("a_norm"), pa.string()), ":")
            out = pa.table({"kind": sub.column("b_kind"),
                            "norm": sub.column("b_norm"), "via": via})
            # local min-combiner: the exchange carries one candidate per
            # (node, batch), not one per edge
            return (out.group_by(["kind", "norm"])
                    .aggregate([("via", "min")])
                    .rename_columns(["kind", "norm", "via"]))

        nxt_rows = (edges.map_batches(expand, batch_format="pyarrow")
                    .groupby(["kind", "norm"])
                    .aggregate(Min(on="via", alias_name="via"))
                    .take_all())
        new = {(r["kind"], r["norm"]): r["via"] for r in nxt_rows
               if (r["kind"], r["norm"]) not in seen}
        if not new:
            break
        for k, via in new.items():
            seen[k] = (depth, via)
        frontier = set(new)
    out = sorted(seen.items())
    return ray.data.from_arrow(pa.table({
        "kind": pa.array([k for (k, _), _dv in out], pa.string()),
        "norm": pa.array([n for (_, n), _dv in out], pa.string()),
        "depth": pa.array([d for _kn, (d, _v) in out], pa.int32()),
        "via": pa.array([v for _kn, (_d, v) in out], pa.string()),
    }).cast(PATHS))


def paths_query(sf_dir: str, *, seed_kind: str = "person",
                seed_norm: str = "alice", max_depth: int = 2):
    from .. import synth
    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    return reachable_paths(extract_triples(tds), [(seed_kind, seed_norm)],
                           max_depth=max_depth)


def paths_sql(rel: str, *, seed_kind: str = "person",
              seed_norm: str = "alice", max_depth: int = 2) -> str:
    """Recursive-CTE oracle for ``reachable_paths``.  Why the min-via
    parity holds: a node first reached at depth d has walk rows at depth d
    whose predecessors are precisely the nodes at distance d-1 adjacent to
    it (a closer adjacent predecessor would contradict d's minimality, and
    symmetric edge storage makes walk lengths ≥ distance with matching
    parity available) — the same candidate set the engine's frontier
    provides, so min-over-candidates agrees."""
    from ..extract import sqlgen as G
    ne = G._norm_expr
    return f"""
    WITH RECURSIVE resolved AS ({G.resolved_triples_sql(rel)}),
    e0 AS (
      SELECT subj_kind AS a_kind, {ne('subj', 'subj_kind')} AS a_norm,
             obj_kind AS b_kind, {ne('obj', 'obj_kind')} AS b_norm
      FROM resolved),
    edges AS (SELECT * FROM e0
              UNION SELECT b_kind, b_norm, a_kind, a_norm FROM e0),
    walk(kind, norm, depth, via) AS (
      SELECT '{seed_kind}', '{seed_norm}', 0, CAST(NULL AS VARCHAR)
      UNION ALL
      SELECT e.b_kind, e.b_norm, w.depth + 1, w.kind || ':' || w.norm
      FROM walk w JOIN edges e
        ON e.a_kind = w.kind AND e.a_norm = w.norm
      WHERE w.depth < {max_depth})
    SELECT kind, norm, CAST(depth AS INTEGER) AS depth, via FROM (
      SELECT kind, norm, depth, via,
             row_number() OVER (PARTITION BY kind, norm
                                ORDER BY depth, via) AS rn
      FROM walk) WHERE rn = 1
    """


def reachable_query(sf_dir: str, *, seed_kind: str = "person",
                    seed_norm: str = "alice", max_depth: int = 2):
    from .. import synth
    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    return reachable(extract_triples(tds), [(seed_kind, seed_norm)],
                     max_depth=max_depth)


def slice_neighborhood(triples_ds: "ray.data.Dataset",
                       seed: tuple[str, str], *, max_depth: int = 2
                       ) -> "ray.data.Dataset":
    """Per-entity neighborhood slice (the ``JoernSlice``/``UsageSlicing``
    analog, ``JoernSlice.scala:48-51``): the induced sub-multigraph of
    resolved triples whose BOTH endpoints lie within ``max_depth`` hops of
    the seed entity.  The reachable set is vocabulary-sized, so membership
    broadcasts once and the triple stream filters with one vectorized
    ``pc.is_in`` per slot — the corpus never shuffles."""
    reach = reachable(triples_ds, [seed], max_depth=max_depth)
    keys = []
    for b in reach.iter_batches(batch_format="pyarrow"):
        if b.num_columns:
            keys.extend(f"{k}\x1f{n}" for k, n in
                        zip(b.column("kind").to_pylist(),
                            b.column("norm").to_pylist()))
    kref = ray.put(pa.array(sorted(keys), pa.string()))

    def fn(t: pa.Table) -> pa.Table:
        ks = ray.get(kref)
        sn = normalize_arrays(t.column("subj_kind"), t.column("subj"))
        on = normalize_arrays(t.column("obj_kind"), t.column("obj"))
        skey = pc.binary_join_element_wise(
            pc.cast(t.column("subj_kind"), pa.string()), sn, "\x1f")
        okey = pc.binary_join_element_wise(
            pc.cast(t.column("obj_kind"), pa.string()), on, "\x1f")
        mask = pc.and_(pc.is_in(skey, value_set=ks),
                       pc.is_in(okey, value_set=ks))
        sub = t.filter(mask)
        return pa.table({
            "conv_id": sub.column("conv_id"),
            "turn_idx": sub.column("turn_idx").cast(pa.int32()),
            "subj_kind": sub.column("subj_kind"),
            "subj_norm": normalize_arrays(sub.column("subj_kind"),
                                          sub.column("subj")),
            "pred": sub.column("pred"),
            "obj_kind": sub.column("obj_kind"),
            "obj_norm": normalize_arrays(sub.column("obj_kind"),
                                         sub.column("obj")),
        })
    return triples_ds.map_batches(fn, batch_format="pyarrow")


def slice_query(sf_dir: str, *, seed_kind: str = "person",
                seed_norm: str = "alice", max_depth: int = 2):
    from .. import synth
    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    triples = extract_triples(tds).materialize()
    return slice_neighborhood(triples, (seed_kind, seed_norm),
                              max_depth=max_depth)


def slice_sql(rel: str, *, seed_kind: str = "person",
              seed_norm: str = "alice", max_depth: int = 2) -> str:
    from ..extract import sqlgen as G
    ne = G._norm_expr
    return f"""
    WITH reach AS ({reachable_sql(rel, seed_kind=seed_kind,
                                  seed_norm=seed_norm,
                                  max_depth=max_depth)}),
    resolved AS ({G.resolved_triples_sql(rel)})
    SELECT conv_id, turn_idx, subj_kind,
           {ne('subj', 'subj_kind')} AS subj_norm, pred, obj_kind,
           {ne('obj', 'obj_kind')} AS obj_norm
    FROM resolved
    WHERE subj_kind || chr(31) || {ne('subj', 'subj_kind')}
            IN (SELECT kind || chr(31) || norm FROM reach)
      AND obj_kind || chr(31) || {ne('obj', 'obj_kind')}
            IN (SELECT kind || chr(31) || norm FROM reach)
    """


def reachable_sql(rel: str, *, seed_kind: str = "person",
                  seed_norm: str = "alice", max_depth: int = 2) -> str:
    from ..extract import sqlgen as G
    ne = G._norm_expr
    return f"""
    WITH RECURSIVE resolved AS ({G.resolved_triples_sql(rel)}),
    e0 AS (
      SELECT subj_kind AS a_kind, {ne('subj', 'subj_kind')} AS a_norm,
             obj_kind AS b_kind, {ne('obj', 'obj_kind')} AS b_norm
      FROM resolved),
    edges AS (SELECT * FROM e0
              UNION SELECT b_kind, b_norm, a_kind, a_norm FROM e0),
    walk(kind, norm, depth) AS (
      SELECT '{seed_kind}', '{seed_norm}', 0
      UNION ALL
      SELECT e.b_kind, e.b_norm, w.depth + 1
      FROM walk w JOIN edges e
        ON e.a_kind = w.kind AND e.a_norm = w.norm
      WHERE w.depth < {max_depth})
    SELECT kind, norm, CAST(min(depth) AS INTEGER) AS depth
    FROM walk GROUP BY 1, 2
    """
