"""Graph export sinks — the JoernExport analog
(``joern-cli/.../JoernExport.scala:26-131``: dot / Neo4j CSV / graphson /
JSON reprs; per-method subgraph split at ``JoernExport.scala:186-200``).

Canonical storage stays Parquet; these are small formatter stages:
 - ``write_jsonl``      — newline-delimited JSON (write_json sink)
 - ``write_neo4j_csv``  — nodes/edges with Neo4j bulk-import headers
 - ``dot_per_conversation`` — one dot digraph per conversation subgraph
   (the splitByMethod analog: partition key = conv_id, induced edges only)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.buckets import bucketed_group_map

_EDGE_IN = pa.schema([("conv_id", pa.string()), ("src", pa.string()),
                      ("dst", pa.string()), ("label", pa.string())])


def _conv_edges(edges_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Narrow the exchange to the formatter's columns; drop conv-less
    (entity-to-entity) edges."""
    return edges_ds.map_batches(
        lambda t: (t.filter(pc.is_valid(t.column("conv_id")))
                   .select(["conv_id", "src", "dst", "label"]))
        if t.num_columns else t,
        batch_format="pyarrow")


def write_jsonl(ds: "ray.data.Dataset", out_dir: str) -> None:
    ds.write_json(out_dir)


def write_neo4j_csv(nodes_ds: "ray.data.Dataset", edges_ds: "ray.data.Dataset",
                    out_dir: str) -> None:
    """Neo4j admin-import layout: nodes with :ID/:LABEL, edges with
    :START_ID/:END_ID/:TYPE (column-rename formatters, parallel CSV)."""
    def node_fmt(t: pa.Table) -> pa.Table:
        cols = {":ID": t.column("node_id"), ":LABEL": t.column("label")}
        for name in t.schema.names:
            if name not in ("node_id", "label"):
                cols[name] = t.column(name)
        return pa.table(cols)

    def edge_fmt(t: pa.Table) -> pa.Table:
        cols = {":START_ID": t.column("src"), ":END_ID": t.column("dst"),
                ":TYPE": t.column("label")}
        for name in t.schema.names:
            if name not in ("src", "dst", "label"):
                cols[name] = t.column(name)
        return pa.table(cols)

    nodes_ds.map_batches(node_fmt, batch_format="pyarrow") \
        .write_csv(f"{out_dir}/nodes")
    edges_ds.map_batches(edge_fmt, batch_format="pyarrow") \
        .write_csv(f"{out_dir}/edges")


def conv_triples_json(canon_triples_ds: "ray.data.Dataset"
                      ) -> "ray.data.Dataset":
    """One JSON record per conversation holding its sorted canonical
    triples — the exact shape analog of the fork's per-method dependency
    JSON (one file per internal method, ``DumpDependency.scala:18-50``,
    records built in ``DependencyJsonGenerator.scala:118-135``); the
    per-conversation sort mirrors its deterministic member ordering."""
    import json

    def fmt(group: pa.Table) -> pa.Table:
        conv = group.column("conv_id")[0].as_py()
        rows = sorted(
            (r["turn_idx"], r["subj_canonical"], r["pred"],
             r["obj_canonical"], r["subj_id"], r["obj_id"])
            for r in group.to_pylist())
        doc = json.dumps({
            "conv_id": conv,
            "triples": [dict(turn_idx=t, subj=s, pred=p, obj=o,
                             subj_id=si, obj_id=oi)
                        for t, s, p, o, si, oi in rows],
        }, sort_keys=True)
        return pa.table({"conv_id": pa.array([conv], pa.string()),
                         "json": pa.array([doc], pa.string())})

    cols = ["conv_id", "turn_idx", "subj_canonical", "pred",
            "obj_canonical", "subj_id", "obj_id"]
    narrowed = canon_triples_ds.map_batches(
        lambda t: t.select(cols) if t.num_columns else t,
        batch_format="pyarrow")
    return bucketed_group_map(
        narrowed, "conv_id", fmt,
        pa.schema([("conv_id", pa.string()), ("json", pa.string())]))


def _quote(s: str) -> str:
    return '"' + str(s).replace("\\", "\\\\").replace('"', '\\"') + '"'


def dot_per_conversation(edges_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Edges (src, dst, label, conv_id, ...) → (conv_id, dot) — one
    deterministic digraph per conversation (sorted edge order)."""
    def fmt(group: pa.Table) -> pa.Table:
        conv = group.column("conv_id")[0].as_py()
        g = group.sort_by([("src", "ascending"), ("dst", "ascending"),
                           ("label", "ascending")])
        lines = [f"digraph {_quote(conv)} {{"]
        for src, dst, lab in zip(g.column("src").to_pylist(),
                                 g.column("dst").to_pylist(),
                                 g.column("label").to_pylist()):
            lines.append(f"  {_quote(src)} -> {_quote(dst)} "
                         f"[label={_quote(lab)}];")
        lines.append("}")
        return pa.table({"conv_id": pa.array([conv], pa.string()),
                         "dot": pa.array(["\n".join(lines)], pa.string())})

    return bucketed_group_map(
        _conv_edges(edges_ds), "conv_id", fmt,
        pa.schema([("conv_id", pa.string()), ("dot", pa.string())]),
        in_schema=_EDGE_IN)


def _xml_escape(s: str) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def graphml_per_conversation(edges_ds: "ray.data.Dataset"
                             ) -> "ray.data.Dataset":
    """Edges → (conv_id, graphml): one GraphML document per conversation
    subgraph — the ``Repr.graphml`` sink of ``JoernExport.scala:97-131``
    re-expressed as a per-partition formatter (node set = edge endpoints,
    deterministic sorted order; round-trip tested via xml parsing)."""
    def fmt(group: pa.Table) -> pa.Table:
        conv = group.column("conv_id")[0].as_py()
        g = group.sort_by([("src", "ascending"), ("dst", "ascending"),
                           ("label", "ascending")])
        srcs = g.column("src").to_pylist()
        dsts = g.column("dst").to_pylist()
        labs = g.column("label").to_pylist()
        nodes = sorted(set(srcs) | set(dsts))
        lines = [
            '<?xml version="1.0" encoding="UTF-8"?>',
            '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
            '  <key id="label" for="edge" attr.name="label" '
            'attr.type="string"/>',
            f'  <graph id="{_xml_escape(conv)}" edgedefault="directed">',
        ]
        lines += [f'    <node id="{_xml_escape(n)}"/>' for n in nodes]
        for i, (s, d, l) in enumerate(zip(srcs, dsts, labs)):
            lines.append(
                f'    <edge id="e{i}" source="{_xml_escape(s)}" '
                f'target="{_xml_escape(d)}">'
                f'<data key="label">{_xml_escape(l)}</data></edge>')
        lines += ["  </graph>", "</graphml>"]
        return pa.table({"conv_id": pa.array([conv], pa.string()),
                         "graphml": pa.array(["\n".join(lines)], pa.string())})

    return bucketed_group_map(
        _conv_edges(edges_ds), "conv_id", fmt,
        pa.schema([("conv_id", pa.string()), ("graphml", pa.string())]),
        in_schema=_EDGE_IN)


def graphson_per_conversation(edges_ds: "ray.data.Dataset"
                              ) -> "ray.data.Dataset":
    """Edges → (conv_id, graphson): TinkerPop-style GraphSON documents
    (``Repr.graphson`` of ``JoernExport.scala:97-131``): one JSON object
    with sorted vertices + edges per conversation subgraph."""
    import json

    def fmt(group: pa.Table) -> pa.Table:
        conv = group.column("conv_id")[0].as_py()
        g = group.sort_by([("src", "ascending"), ("dst", "ascending"),
                           ("label", "ascending")])
        srcs = g.column("src").to_pylist()
        dsts = g.column("dst").to_pylist()
        labs = g.column("label").to_pylist()
        doc = json.dumps({
            "graph": conv,
            "vertices": [{"id": n} for n in sorted(set(srcs) | set(dsts))],
            "edges": [{"id": f"e{i}", "outV": s, "inV": d, "label": l}
                      for i, (s, d, l) in enumerate(zip(srcs, dsts, labs))],
        }, sort_keys=True)
        return pa.table({"conv_id": pa.array([conv], pa.string()),
                         "graphson": pa.array([doc], pa.string())})

    return bucketed_group_map(
        _conv_edges(edges_ds), "conv_id", fmt,
        pa.schema([("conv_id", pa.string()), ("graphson", pa.string())]),
        in_schema=_EDGE_IN)
