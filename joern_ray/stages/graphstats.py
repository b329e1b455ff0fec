"""Graph-shape metrics over the entity co-occurrence graph: per-entity
triangle counts + local clustering coefficient, and k-core decomposition.

Reference analog: the querydb graph-metric queries
(``querydb/src/main/scala/io/joern/scanners/c/Metrics.scala:41-80`` —
cyclomatic complexity and friends are per-node graph-shape metrics over
the CPG) and the engine's task-parallel traversal family (SURVEY §2.10).
Here the graph is the undirected entity co-occurrence graph
(``chains.cooccurrence``: distinct ``a < b`` weighted pairs), which is
VOCABULARY-sized by construction — the corpus-sized mention stream is
reduced to distinct entity pairs before anything in this module runs.

Triangle counting is the degree-oriented node-iterator (the standard
two-round distributed algorithm): orient every edge from its lower
``(degree, name)`` endpoint to its higher one, emit the out-neighbor
wedges of each node, and close wedges against the oriented edge set with
ONE hash-bucketed cogroup.  Under this orientation every triangle is
produced by exactly one wedge, and every node's out-degree is O(sqrt(m))
(the classic bound), so the wedge multiset is O(m^1.5) with NO per-node
cap needed.  Degrees attach to edges via broadcast ``pc.index_in``
below ``GRAPH_MAX_BROADCAST_NODES`` and via two bucketed cogroup
exchanges beyond it (equivalence-tested), mirroring the
``cc.py``/``pagerank.py`` guard-constant discipline.

k-core runs the h-index fixed point (Lue/Zhou et al., "The H-index of a
network node", 2016): init every node's label to its degree; each round
replace it with the h-index of its neighbors' labels; the labels
converge monotonically DOWN to the core numbers.  The directed edge
list is factorized to int ids and hash-bucketed ONCE (each node's whole
neighborhood lives in exactly one bucket shard); each round broadcasts
the vocabulary-sized label vector (``ray.put`` once, same justification
as ``pagerank.DRIVER_MAX_PAGERANK_NODES``: the node set is
vocabulary-sized by construction) and runs one fully-vectorized
segment-h-index kernel per shard — no per-node Python in the loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.buckets import add_bucket

# beyond this node count the degree lookup switches from a broadcast
# `pc.index_in` to the two-exchange bucketed cogroup path (`cc.py` /
# `pagerank.py` discipline); the node set is the entity vocabulary.
GRAPH_MAX_BROADCAST_NODES = 2_000_000
GRAPH_BUCKETS = 256
# h-index iteration converges in O(graph eccentricity-ish) rounds in
# practice; the cap is a safety rail, not a truncation — convergence is
# detected by a changed-label count reaching zero.
KCORE_MAX_ROUNDS = 100

_SEP = "\x1f"  # entity keys are 'kind:norm' — never contain 0x1f

_EDGE_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string())])
_DEG_SCHEMA = pa.schema([("node", pa.string()), ("deg", pa.int64())])
_ORIENTED = pa.schema([("src", pa.string()), ("dst", pa.string()),
                       ("ddeg", pa.int64())])
_WEDGE = pa.schema([("k", pa.string()), ("witness", pa.string()),
                    ("side", pa.int64())])
_CREDIT = pa.schema([("entity", pa.string()), ("tri", pa.int64()),
                     ("deg", pa.int64())])
_TRI_OUT = pa.schema([("entity", pa.string()), ("degree", pa.int64()),
                      ("n_tri", pa.int64()), ("lcc_milli", pa.int64())])


def _degrees(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(node, deg) — two-phase: per-batch combiner, one vocab-sized
    groupby.  Input edges are distinct ``a < b`` pairs, so the count of
    endpoint occurrences IS the simple-graph degree."""
    def part(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _DEG_SCHEMA.empty_table()
        nodes = pa.concat_arrays(
            [t.column("a").combine_chunks().cast(pa.string()),
             t.column("b").combine_chunks().cast(pa.string())])
        return (pa.table({"node": nodes}).group_by("node")
                .aggregate([("node", "count")])
                .rename_columns(["node", "deg"]).cast(_DEG_SCHEMA))

    return (edges.map_batches(part, batch_format="pyarrow")
            .groupby("node").aggregate(Sum(on="deg", alias_name="deg"))
            .map_batches(
                lambda t: (t.select(["node", "deg"]).cast(_DEG_SCHEMA)
                           if t.num_columns else _DEG_SCHEMA.empty_table()),
                batch_format="pyarrow"))


def _orient_broadcast(edges: "ray.data.Dataset",
                      deg_ref) -> "ray.data.Dataset":
    """(src, dst, ddeg) oriented edges — degree lookup is ONE
    ``pc.index_in`` + take per batch against the broadcast parallel
    (node, deg) arrays."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _ORIENTED.empty_table()
        nodes, degs = ray.get(deg_ref)
        a = t.column("a").combine_chunks().cast(pa.string())
        b = t.column("b").combine_chunks().cast(pa.string())
        da = degs.take(pc.index_in(a, value_set=nodes))
        db = degs.take(pc.index_in(b, value_set=nodes))
        # a < b already holds, so equal degrees orient a -> b
        a_first = pc.less_equal(da, db)
        return pa.table({
            "src": pc.if_else(a_first, a, b),
            "dst": pc.if_else(a_first, b, a),
            "ddeg": pc.if_else(a_first, db, da),
        }).cast(_ORIENTED)

    return edges.map_batches(fn, batch_format="pyarrow")


def _attach_deg_cogroup(edges: "ray.data.Dataset",
                        degrees: "ray.data.Dataset",
                        key: str, out_col: str,
                        in_schema: pa.Schema) -> "ray.data.Dataset":
    """Attach ``deg(key)`` to every edge row as ``out_col`` via one
    hash-bucketed cogroup (tagged union of edge rows and degree rows) —
    the beyond-broadcast path.  Edge rows keep all existing columns;
    degree rows ride the same exchange with the edge columns null-filled
    at their DECLARED types (``in_schema``) so the union has one schema."""
    tag_schema = pa.schema(list(in_schema) +
                           [("_k", pa.string()), ("_deg", pa.int64())])

    def tag_edges(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            t = in_schema.empty_table()
        keyed = t.cast(in_schema).append_column(
            "_k", t.column(key).combine_chunks().cast(pa.string()))
        keyed = keyed.append_column(
            "_deg", pa.array([None] * t.num_rows, pa.int64()))
        return add_bucket(keyed, "_k", GRAPH_BUCKETS)

    def tag_degs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            t = _DEG_SCHEMA.empty_table()
        base = {f.name: pa.nulls(t.num_rows, f.type) for f in in_schema}
        base["_k"] = t.column("node").combine_chunks().cast(pa.string())
        base["_deg"] = t.column("deg").combine_chunks().cast(pa.int64())
        return add_bucket(pa.table(base).cast(tag_schema), "_k",
                          GRAPH_BUCKETS)

    def shard(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"]).combine_chunks()
        is_deg = pc.is_valid(g.column("_deg"))
        degs = g.filter(is_deg)
        eds = g.filter(pc.invert(is_deg))
        if eds.num_rows == 0:
            return (in_schema.empty_table()
                    .append_column(out_col, pa.array([], pa.int64())))
        pos = pc.index_in(eds.column("_k"),
                          value_set=degs.column("_k").combine_chunks())
        dvals = degs.column("_deg").combine_chunks().take(pos)
        return (eds.drop_columns(["_k", "_deg"])
                .append_column(out_col, dvals.cast(pa.int64())))

    tagged = (edges.map_batches(tag_edges, batch_format="pyarrow")
              .union(degrees.map_batches(tag_degs,
                                         batch_format="pyarrow")))
    return tagged.groupby("bucket").map_groups(shard,
                                               batch_format="pyarrow")


def _orient_cogroup(edges: "ray.data.Dataset",
                    degrees: "ray.data.Dataset") -> "ray.data.Dataset":
    """Beyond-broadcast orientation: two bucketed degree-attach exchanges
    (by ``a``, then by ``b``), then a pure per-batch orient map."""
    with_da = _attach_deg_cogroup(edges, degrees, "a", "da", _EDGE_SCHEMA)
    da_schema = pa.schema(list(_EDGE_SCHEMA) + [("da", pa.int64())])
    with_both = _attach_deg_cogroup(with_da, degrees, "b", "db", da_schema)

    def orient(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _ORIENTED.empty_table()
        a = t.column("a").combine_chunks().cast(pa.string())
        b = t.column("b").combine_chunks().cast(pa.string())
        da = t.column("da").combine_chunks()
        db = t.column("db").combine_chunks()
        a_first = pc.less_equal(da, db)
        return pa.table({
            "src": pc.if_else(a_first, a, b),
            "dst": pc.if_else(a_first, b, a),
            "ddeg": pc.if_else(a_first, db, da),
        }).cast(_ORIENTED)

    return with_both.map_batches(orient, batch_format="pyarrow")


def _wedges(oriented: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-node out-neighbor wedges, keyed by the candidate closing edge
    ``u<SEP>v`` (u before v in the ORIENTATION order, i.e. by
    (out-neighbor degree, name) — the same total order the edges were
    oriented by, so closure is a plain key match)."""
    def keyed(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _ORIENTED.empty_table().append_column(
                "bucket", pa.array([], pa.int64()))
        return add_bucket(t, "src", GRAPH_BUCKETS)

    def shard(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"]).combine_chunks()
        if g.num_rows == 0:
            return _WEDGE.empty_table()
        src = g.column("src").to_numpy(zero_copy_only=False)
        dst = g.column("dst").to_numpy(zero_copy_only=False)
        ddeg = g.column("ddeg").to_numpy(zero_copy_only=False)
        # sort by (src, orientation-key of dst) so each node's
        # out-neighborhood is a contiguous run in closing-edge order
        order = np.lexsort((dst, ddeg, src))
        src, dst = src[order], dst[order]
        change = np.flatnonzero(src[1:] != src[:-1]) + 1
        bounds = np.concatenate(([0], change, [len(src)]))
        ks, ws = [], []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            k = hi - lo
            if k < 2:
                continue
            nb = dst[lo:hi].astype(object)
            iu, iv = np.triu_indices(k, 1)
            # object-dtype elementwise str concat (operator.add ufunc)
            ks.append(nb[iu] + _SEP + nb[iv])
            ws.append(np.repeat(src[lo], len(iu)))
        if not ks:
            return _WEDGE.empty_table()
        return pa.table({
            "k": pa.array(np.concatenate(ks), pa.string()),
            "witness": pa.array(np.concatenate(ws), pa.string()),
            "side": pa.array(np.zeros(sum(len(x) for x in ks),
                                      dtype="int64")),
        }).cast(_WEDGE)

    return (oriented.map_batches(keyed, batch_format="pyarrow")
            .groupby("bucket").map_groups(shard, batch_format="pyarrow"))


def triangles(edges: "ray.data.Dataset", *,
              max_broadcast_nodes: int = GRAPH_MAX_BROADCAST_NODES
              ) -> "ray.data.Dataset":
    """(entity, degree, n_tri, lcc_milli) for every node of the
    co-occurrence graph.  ``lcc_milli = (2000 * n_tri) //
    (degree * (degree - 1))`` — the integer-milli local clustering
    coefficient (the house no-floats-in-oracle-hashes discipline)."""
    edges = edges.map_batches(
        lambda t: (t.select(["a", "b"]).cast(_EDGE_SCHEMA)
                   if t.num_columns else _EDGE_SCHEMA.empty_table()),
        batch_format="pyarrow").materialize()
    degrees = _degrees(edges).materialize()
    n_nodes = degrees.count()
    if n_nodes == 0:
        return ray.data.from_arrow(_TRI_OUT.empty_table())

    if n_nodes <= max_broadcast_nodes:
        parts = [b for b in degrees.iter_batches(batch_format="pyarrow")
                 if b.num_columns and b.num_rows]
        dt = pa.concat_tables(parts).combine_chunks()
        deg_ref = ray.put((dt.column("node").combine_chunks(),
                           dt.column("deg").combine_chunks()))
        oriented = _orient_broadcast(edges, deg_ref)
    else:
        oriented = _orient_cogroup(edges, degrees)
    oriented = oriented.materialize()

    # closure: wedges (side=0) and oriented-edge keys (side=1) ride ONE
    # tagged bucketed exchange keyed by the candidate closing edge
    def edge_keys(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _WEDGE.empty_table()
        src = t.column("src").combine_chunks().cast(pa.string())
        dst = t.column("dst").combine_chunks().cast(pa.string())
        return pa.table({
            "k": pc.binary_join_element_wise(src, dst, _SEP),
            "witness": pa.array([""] * t.num_rows, pa.string()),
            "side": pa.array(np.ones(t.num_rows, dtype="int64")),
        }).cast(_WEDGE)

    tagged = _wedges(oriented).union(
        oriented.map_batches(edge_keys, batch_format="pyarrow"))

    def close_shard(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"]).combine_chunks()
        if g.num_rows == 0:
            return _CREDIT.empty_table()
        is_edge = pc.equal(g.column("side"), 1)
        ekeys = g.filter(is_edge).column("k").combine_chunks()
        wedges = g.filter(pc.invert(is_edge))
        hit = pc.fill_null(pc.is_in(wedges.column("k"),
                                    value_set=ekeys), False)
        m = wedges.filter(hit)
        if m.num_rows == 0:
            return _CREDIT.empty_table()
        uv = pc.split_pattern(m.column("k").combine_chunks(), _SEP)
        flat = pc.list_flatten(uv)
        both = flat.to_numpy(zero_copy_only=False).reshape(-1, 2)
        ents = pa.array(np.concatenate([
            m.column("witness").to_numpy(zero_copy_only=False),
            both[:, 0], both[:, 1]]), pa.string())
        t = pa.table({"entity": ents})
        out = (t.group_by("entity").aggregate([("entity", "count")])
               .rename_columns(["entity", "tri"]))
        return out.append_column(
            "deg", pa.array(np.zeros(out.num_rows, dtype="int64"))) \
            .cast(_CREDIT)

    credits = (tagged.map_batches(
        lambda t: add_bucket(t, "k", GRAPH_BUCKETS) if t.num_columns
        else _WEDGE.empty_table().append_column(
            "bucket", pa.array([], pa.int64())),
        batch_format="pyarrow")
        .groupby("bucket").map_groups(close_shard, batch_format="pyarrow"))

    # zero-triangle nodes + degrees ride the SAME final exchange: degree
    # rows carry (entity, tri=0, deg), credit rows (entity, tri, deg=0)
    deg_rows = degrees.map_batches(
        lambda t: (pa.table({
            "entity": t.column("node").combine_chunks().cast(pa.string()),
            "tri": pa.array(np.zeros(t.num_rows, dtype="int64")),
            "deg": t.column("deg").combine_chunks().cast(pa.int64()),
        }).cast(_CREDIT) if t.num_columns else _CREDIT.empty_table()),
        batch_format="pyarrow")

    folded = (credits.union(deg_rows).groupby("entity")
              .aggregate(Sum(on="tri", alias_name="n_tri"),
                         Sum(on="deg", alias_name="degree")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _TRI_OUT.empty_table()
        deg = t.column("degree").to_numpy(zero_copy_only=False)
        tri = t.column("n_tri").to_numpy(zero_copy_only=False)
        denom = deg * (deg - 1)
        lcc = np.where(denom >= 2, (2000 * tri) // np.maximum(denom, 1), 0)
        return pa.table({
            "entity": t.column("entity").combine_chunks().cast(pa.string()),
            "degree": pa.array(deg, pa.int64()),
            "n_tri": pa.array(tri, pa.int64()),
            "lcc_milli": pa.array(lcc, pa.int64()),
        }).cast(_TRI_OUT)

    return folded.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# k-core decomposition (h-index fixed point)
# ---------------------------------------------------------------------------

_KCORE_OUT = pa.schema([("entity", pa.string()), ("core", pa.int64())])


def _segment_h_index(node_idx: np.ndarray,
                     nb_label: np.ndarray, n: int) -> np.ndarray:
    """Vectorized per-node h-index of neighbor labels.  For each node,
    sort its neighbor labels descending; h = #{i : label_i >= i+1}.
    Because labels are descending and ranks ascending, the predicate is
    a prefix — one ``reduceat`` per shard, no per-node Python."""
    if len(node_idx) == 0:
        return np.zeros(n, dtype="int64")
    order = np.lexsort((-nb_label, node_idx))
    ns, ls = node_idx[order], nb_label[order]
    starts = np.flatnonzero(np.r_[True, ns[1:] != ns[:-1]])
    grp = np.cumsum(np.r_[True, ns[1:] != ns[:-1]]) - 1
    rank = np.arange(len(ns)) - starts[grp] + 1
    ok = (ls >= rank).astype("int64")
    h = np.add.reduceat(ok, starts)
    out = np.zeros(n, dtype="int64")
    out[ns[starts]] = h
    return out


def kcore(edges: "ray.data.Dataset", *,
          max_rounds: int = KCORE_MAX_ROUNDS) -> "ray.data.Dataset":
    """(entity, core) — core numbers via the h-index fixed point.

    The directed (node, nbr) edge list is factorized to int ids with one
    broadcast ``pc.index_in`` per batch and hash-bucketed ONCE (each
    node's whole neighborhood lands in one shard); every round is one
    broadcast of the vocabulary-sized label vector + one vectorized
    segment-h-index kernel per shard, whose per-node outputs the driver
    folds (exactly one row per node reaches the driver — the
    ``pagerank._fold_dense`` bound)."""
    edges = edges.map_batches(
        lambda t: (t.select(["a", "b"]).cast(_EDGE_SCHEMA)
                   if t.num_columns else _EDGE_SCHEMA.empty_table()),
        batch_format="pyarrow").materialize()
    degrees = _degrees(edges).materialize()
    parts = [b for b in degrees.iter_batches(batch_format="pyarrow")
             if b.num_columns and b.num_rows]
    if not parts:
        return ray.data.from_arrow(_KCORE_OUT.empty_table())
    dt = pa.concat_tables(parts).combine_chunks() \
        .sort_by([("node", "ascending")])
    nodes = dt.column("node").combine_chunks()
    n = len(nodes)
    labels = dt.column("deg").to_numpy(zero_copy_only=False).astype("int64")
    nref = ray.put(nodes)

    def to_idx(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"ni": pa.array([], pa.int64()),
                             "bi": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        nodes_ = ray.get(nref)
        ai = pc.index_in(t.column("a").combine_chunks().cast(pa.string()),
                         value_set=nodes_).cast(pa.int64())
        bi = pc.index_in(t.column("b").combine_chunks().cast(pa.string()),
                         value_set=nodes_).cast(pa.int64())
        ni = pa.concat_arrays([ai.combine_chunks()
                               if isinstance(ai, pa.ChunkedArray) else ai,
                               bi.combine_chunks()
                               if isinstance(bi, pa.ChunkedArray) else bi])
        nb = pa.concat_arrays([bi.combine_chunks()
                               if isinstance(bi, pa.ChunkedArray) else bi,
                               ai.combine_chunks()
                               if isinstance(ai, pa.ChunkedArray) else ai])
        out = pa.table({"ni": ni, "bi": nb})
        h = (ni.to_numpy(zero_copy_only=False) % GRAPH_BUCKETS)
        return out.append_column("bucket", pa.array(h.astype("int64")))

    # bucketed ONCE; every round reuses these shards
    iedges = (edges.map_batches(to_idx, batch_format="pyarrow")
              .materialize())

    for _ in range(max_rounds):
        lref = ray.put(labels)

        def shard(g: pa.Table, _l=lref) -> pa.Table:
            labs = ray.get(_l)
            ni = g.column("ni").to_numpy(zero_copy_only=False)
            bi = g.column("bi").to_numpy(zero_copy_only=False)
            if len(ni) == 0:
                return pa.table({"i": pa.array([], pa.int64()),
                                 "h": pa.array([], pa.int64())})
            h = _segment_h_index(ni, labs[bi], len(labs))
            present = np.unique(ni)
            return pa.table({"i": pa.array(present, pa.int64()),
                             "h": pa.array(h[present], pa.int64())})

        rows = (iedges.groupby("bucket")
                .map_groups(shard, batch_format="pyarrow").take_all())
        new_labels = np.zeros(n, dtype="int64")
        for r in rows:
            new_labels[r["i"]] = r["h"]
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels

    return ray.data.from_arrow(pa.table({
        "entity": nodes, "core": pa.array(labels, pa.int64())})
        .cast(_KCORE_OUT))


# ---------------------------------------------------------------------------
# query surface
# ---------------------------------------------------------------------------

def _cooccur_edges(sf_dir: str) -> "ray.data.Dataset":
    from .. import synth
    from .chains import cooccurrence
    from .extract import extract_triples
    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    return cooccurrence(extract_triples(tds))


def triangles_query(sf_dir: str):
    return triangles(_cooccur_edges(sf_dir))


def kcore_query(sf_dir: str):
    return kcore(_cooccur_edges(sf_dir))


def kcore_sql(rel: str, *, max_rounds: int = KCORE_MAX_ROUNDS) -> str:
    """DuckDB mirror of the h-index k-core fixpoint (r5): the SAME
    update rule as the engine — labels init to degree; each round every
    node's label becomes the h-index of its neighbors' labels (#
    positions where the descending-sorted neighbor label >= its rank) —
    iterated ``max_rounds`` times via a recursive CTE.  The h-index
    iteration converges to coreness (Lu et al. 2016) and is idempotent
    at the fixpoint, so running the full ``max_rounds`` rounds equals
    the engine's converge-early loop; if neither converges, both have
    applied the identical update the identical number of times."""
    from .chains import cooccurrence_sql
    return f"""
    WITH RECURSIVE cooc AS MATERIALIZED ({cooccurrence_sql(rel)}),
    und AS (SELECT a AS x, b AS y FROM cooc
            UNION ALL SELECT b, a FROM cooc),
    deg AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS lab
            FROM und GROUP BY 1),
    it AS (
      SELECT 0 AS round, node, lab FROM deg
      UNION ALL
      SELECT round + 1, node,
             CAST(coalesce(sum(CASE WHEN nlab >= rn THEN 1 ELSE 0 END),
                           0) AS BIGINT) AS lab
      FROM (
        SELECT u.x AS node, i.round, i.lab AS nlab,
               row_number() OVER (PARTITION BY u.x
                                  ORDER BY i.lab DESC) AS rn
        FROM und u JOIN it i ON i.node = u.y)
      WHERE round < {max_rounds}
      GROUP BY node, round)
    SELECT node AS entity, lab AS core FROM it
    WHERE round = {max_rounds}
    """


def triangles_sql(rel: str) -> str:
    """DuckDB mirror: once-counted triangles via the a<b<c 3-way
    self-join over the (already a<b, distinct) co-occurrence edge list;
    per-entity credit union; integer-milli clustering coefficient with
    the same floor division as the engine."""
    from .chains import cooccurrence_sql
    return f"""
    WITH cooc AS MATERIALIZED ({cooccurrence_sql(rel)}),
    e AS (SELECT a, b FROM cooc),
    deg AS (SELECT entity, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT a AS entity FROM e
                  UNION ALL SELECT b FROM e) GROUP BY 1),
    t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e2.a = e1.b
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    cr AS (SELECT x AS entity FROM t
           UNION ALL SELECT y FROM t
           UNION ALL SELECT z FROM t),
    tc AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_tri
           FROM cr GROUP BY 1)
    SELECT d.entity, d.degree, coalesce(tc.n_tri, 0) AS n_tri,
           CASE WHEN d.degree >= 2
                THEN (2000 * coalesce(tc.n_tri, 0))
                     // (d.degree * (d.degree - 1))
                ELSE 0 END AS lcc_milli
    FROM deg d LEFT JOIN tc USING (entity)
    """
