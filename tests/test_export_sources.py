"""Export sinks (JoernExport analog) + alternative sources round-trip."""

import glob
import json

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from joern_ray import synth
from joern_ray.sources.jsonl import (read_transcripts_jsonl,
                                     read_transcripts_parquet)
from joern_ray.stages.export import (dot_per_conversation, write_jsonl,
                                     write_neo4j_csv)


def test_jsonl_roundtrip_matches_parquet(ray_session, sf_small, tmp_path):
    tp = synth.transcripts_path(sf_small)
    ds = ray.data.read_parquet(tp)
    out = str(tmp_path / "jsonl")
    write_jsonl(ds.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("ts"),
                               "ts", t.column("ts").cast(pa.int64())),
        batch_format="pyarrow"), out)
    back = read_transcripts_jsonl(out)
    a = back.to_pandas().sort_values(["conv_id", "turn_idx"],
                                     ignore_index=True)
    b = pq.read_table(tp).to_pandas().sort_values(["conv_id", "turn_idx"],
                                                  ignore_index=True)
    assert a[["conv_id", "turn_idx", "role", "text"]].equals(
        b[["conv_id", "turn_idx", "role", "text"]])
    assert (a["ts"] == b["ts"]).all()


def test_parquet_source_prefix_filter(ray_session, sf_small):
    tp = synth.transcripts_path(sf_small)
    ds = read_transcripts_parquet(tp, conv_prefix="conv0000000")
    convs = set(r["conv_id"] for r in ds.take_all())
    assert convs and all(c.startswith("conv0000000") for c in convs)


def test_neo4j_csv_export(ray_session, tmp_path):
    nodes = ray.data.from_arrow(pa.table(
        {"node_id": ["a", "b"], "label": ["TURN", "TURN"],
         "text": ["x", "y"]}))
    edges = ray.data.from_arrow(pa.table(
        {"src": ["a"], "dst": ["b"], "label": ["NEXT_TURN"],
         "conv_id": ["c1"]}))
    out = str(tmp_path / "neo")
    write_neo4j_csv(nodes, edges, out)
    ncsv = sorted(glob.glob(f"{out}/nodes/*"))
    ecsv = sorted(glob.glob(f"{out}/edges/*"))
    assert ncsv and ecsv
    header = open(ncsv[0]).readline().strip()
    assert header.split(",")[:2] == ['":ID"', '":LABEL"'] or \
        header.split(",")[:2] == [":ID", ":LABEL"]
    eheader = open(ecsv[0]).readline().strip().replace('"', "")
    assert eheader.split(",")[:3] == [":START_ID", ":END_ID", ":TYPE"]


def test_dot_per_conversation_deterministic(ray_session):
    edges = ray.data.from_arrow(pa.table({
        "src": ["t1", "t0", "t0"], "dst": ["t2", "t1", "t1"],
        "label": ["NEXT_TURN", "NEXT_TURN", "MENTIONS"],
        "conv_id": ["c1", "c1", "c1"]}))
    rows = dot_per_conversation(edges).take_all()
    assert len(rows) == 1
    dot = rows[0]["dot"]
    assert dot.splitlines()[0] == 'digraph "c1" {'
    # sorted edge order: (t0,t1,MENTIONS) < (t0,t1,NEXT_TURN) < (t1,t2,..)
    body = dot.splitlines()[1:-1]
    assert body == [
        '  "t0" -> "t1" [label="MENTIONS"];',
        '  "t0" -> "t1" [label="NEXT_TURN"];',
        '  "t1" -> "t2" [label="NEXT_TURN"];',
    ]


def test_graphml_roundtrip(ray_session):
    import xml.etree.ElementTree as ET

    import pyarrow as pa
    import ray.data
    from joern_ray.stages import export as EXP

    edges = pa.table({
        "src": ["a", "b", "a"], "dst": ["b", "c", "c"],
        "label": ["NEXT_TURN", "MENTIONS", "FACT"],
        "pred": [None, None, "works_at"],
        "conv_id": ["c1", "c1", "c1"], "turn_idx": [1, 2, 2]})
    out = EXP.graphml_per_conversation(ray.data.from_arrow(edges)).take_all()
    assert len(out) == 1
    root = ET.fromstring(out[0]["graphml"])
    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    parsed_nodes = {n.get("id") for n in root.findall(".//g:node", ns)}
    parsed_edges = {(e.get("source"), e.get("target"),
                     e.find("g:data", ns).text)
                    for e in root.findall(".//g:edge", ns)}
    assert parsed_nodes == {"a", "b", "c"}
    assert parsed_edges == {("a", "b", "NEXT_TURN"), ("b", "c", "MENTIONS"),
                            ("a", "c", "FACT")}


def test_graphson_roundtrip(ray_session):
    import json

    import pyarrow as pa
    import ray.data
    from joern_ray.stages import export as EXP

    edges = pa.table({
        "src": ["a", "b"], "dst": ["b", "c"],
        "label": ["NEXT_TURN", "MENTIONS"],
        "pred": [None, None],
        "conv_id": ["c1", "c1"], "turn_idx": [1, 2]})
    out = EXP.graphson_per_conversation(ray.data.from_arrow(edges)).take_all()
    doc = json.loads(out[0]["graphson"])
    assert {v["id"] for v in doc["vertices"]} == {"a", "b", "c"}
    assert {(e["outV"], e["inV"], e["label"]) for e in doc["edges"]} == \
        {("a", "b", "NEXT_TURN"), ("b", "c", "MENTIONS")}


def test_csv_source_lands_on_canonical_schema(ray_session, tmp_path):
    import pyarrow as pa
    from joern_ray import schema as S
    from joern_ray.sources.jsonl import read_transcripts_csv

    p = tmp_path / "t.csv"
    p.write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        "c1,0,user,Alice works at Acme Corp.,,1767225600000000\n"
        "c1,1,tool,result: ok (3 items),search,1767225600000001\n")
    ds = read_transcripts_csv(str(p))
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    assert t.schema.equals(S.TRANSCRIPTS)
    rows = t.to_pylist()
    assert rows[0]["tool"] is None and rows[1]["tool"] == "search"


def test_preprocess_normalizes_and_is_idempotent(ray_session):
    import pyarrow as pa
    import ray.data
    from joern_ray import schema as S
    from joern_ray.stages.preprocess import preprocess

    rows = [
        dict(conv_id="c1", turn_idx=0, role="user",
             text="  Alice\x00works\r\nat   Acme Corp.  ", tool=None, ts=0),
        dict(conv_id="c1", turn_idx=1, role="user",
             text="plain text.", tool=None, ts=0),
    ]
    cols = {f.name: [r.get(f.name) for r in rows] for f in S.TRANSCRIPTS}
    ds = ray.data.from_arrow(pa.Table.from_pydict(cols, schema=S.TRANSCRIPTS))
    once = [r["text"] for r in preprocess(ds).take_all()]
    assert once == ["Alice works at Acme Corp.", "plain text."]
    twice = [r["text"] for r in preprocess(preprocess(ds)).take_all()]
    assert twice == once
