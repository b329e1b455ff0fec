"""End-to-end KG pipeline: P/R vs ground truth, invariants, resume."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from joern_ray import synth
from joern_ray.pipelines import kg


def _collect(ds) -> pa.Table:
    import ray
    return pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])


@pytest.fixture(scope="module")
def graph(ray_session, sf_small):
    path = synth.transcripts_path(sf_small)
    return kg.build_graph(kg.read_transcripts(path)), sf_small


def test_canonical_triples_pr_vs_ground_truth(graph):
    res, sf = graph
    canon = _collect(res["triples_canonical"])
    gt = pq.read_table(synth.gt_path(sf))
    got = {(r["conv_id"], r["turn_idx"], r["subj_canonical"], r["pred"],
            r["obj_canonical"]) for r in canon.to_pylist()}
    want = {(r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
            for r in gt.to_pylist()}
    inter = len(got & want)
    p, r = inter / max(1, len(got)), inter / max(1, len(want))
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_per_turn_text_equality_under_stable_ordering(graph):
    res, sf = graph
    nodes = _collect(res["nodes"])
    turns = nodes.filter(pc.equal(nodes.column("label"), "TURN"))
    got = turns.select(["conv_id", "turn_idx", "text"]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    want = pq.read_table(synth.transcripts_path(sf),
                         columns=["conv_id", "turn_idx", "text"]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.equals(want.cast(got.schema))


def test_entity_canonicalization_collapses_aliases(graph):
    res, _ = graph
    ents = _collect(res["entities"]).to_pylist()
    orgs = [e for e in ents if e["kind"] == "org"]
    # typo'd member norms must map to the clean canonical (doubled-letter
    # variants are lexicographically larger, so min-label lands on the base)
    by_norm = {e["norm"]: e["canonical"] for e in orgs}
    for norm, canonical in by_norm.items():
        if norm not in by_norm.values() and norm.endswith(norm[-1] * 2):
            assert canonical == norm[:-1], (norm, canonical)
    # canonical ids consistent: same canonical → same entity_id
    ids = {}
    for e in orgs:
        ids.setdefault((e["kind"], e["canonical"]), set()).add(e["entity_id"])
    assert all(len(v) == 1 for v in ids.values())


def test_next_turn_edges_form_conversation_chains(graph):
    res, sf = graph
    edges = _collect(res["edges"])
    nt = edges.filter(pc.equal(edges.column("label"), "NEXT_TURN"))
    n_turns = pq.read_table(synth.transcripts_path(sf)).num_rows
    n_convs = len(set(pq.read_table(synth.transcripts_path(sf),
                                    columns=["conv_id"]).column(0).to_pylist()))
    assert nt.num_rows == n_turns - n_convs


def test_checkpointed_build_and_resume(ray_session, sf_small, tmp_path):
    out = str(tmp_path / "kg_out")
    path = synth.transcripts_path(sf_small)
    man1 = kg.build_checkpointed(path, out)
    stages = man1.completed_stages()
    assert set(stages) == {"triples_surface", "entities", "triples_canonical",
                           "nodes", "edges"}
    fps1 = {s: man1.read_record(s)["fingerprint"] for s in stages}

    # simulate a crash after stage 2: drop the last three stages' outputs
    for s in ("triples_canonical", "nodes", "edges"):
        os.remove(man1.record_path(s))
        shutil.rmtree(man1.stage_dir(s))
    # corrupt a surviving stage dir with a partial file from the "crash"
    man2 = kg.build_checkpointed(path, out)
    fps2 = {s: man2.read_record(s)["fingerprint"] for s in stages}
    assert fps1 == fps2, "resume must reproduce identical content"
    # resumed run must NOT have rebuilt completed stages
    rec = man2.read_record("triples_surface")
    assert rec == man1.read_record("triples_surface")


def test_resume_skips_completed_stages_entirely(ray_session, sf_small, tmp_path):
    out = str(tmp_path / "kg_out2")
    path = synth.transcripts_path(sf_small)
    man1 = kg.build_checkpointed(path, out)
    mtimes = {s: os.path.getmtime(man1.record_path(s))
              for s in man1.completed_stages()}
    man2 = kg.build_checkpointed(path, out)
    for s, m in mtimes.items():
        assert os.path.getmtime(man2.record_path(s)) == m


def test_replies_to_and_uses_tool_edges(graph):
    res, sf = graph
    edges = _collect(res["edges"])
    t = pq.read_table(synth.transcripts_path(sf),
                      columns=["conv_id", "turn_idx", "role", "tool"])
    rt = edges.filter(pc.equal(edges.column("label"), "REPLIES_TO"))
    n_assistant_replies = t.filter(
        pc.and_(pc.equal(t.column("role"), "assistant"),
                pc.greater(t.column("turn_idx"), 0))).num_rows
    assert rt.num_rows == n_assistant_replies

    ut = edges.filter(pc.equal(edges.column("label"), "USES_TOOL"))
    n_tool_turns = t.filter(
        pc.and_(pc.equal(t.column("role"), "tool"),
                pc.is_valid(t.column("tool")))).num_rows
    assert ut.num_rows == n_tool_turns
