"""Externally-loaded semantics config (the semanticsloader/extraFlows
analog): templates, findings rules and extra flows merge onto the built-in
defaults without engine-code changes."""

import json

import pyarrow as pa
import pytest

import ray.data

from joern_ray import schema as S
from joern_ray.state import config as C


def _mk(rows):
    cols = {f.name: [r.get(f.name) for r in rows] for f in S.TRANSCRIPTS}
    return pa.Table.from_pydict(cols, schema=S.TRANSCRIPTS)


CFG = {
    "templates": [
        {"pred": "mentored",
         "regex": r"^(?P<subj>[A-Z][a-z]+) mentored (?P<obj>[A-Z][a-z]+)\.$",
         "subj_kind": "person", "obj_kind": "person"},
    ],
    "multi_templates": [
        {"name": "co_mentored",
         "regex": (r"^(?P<a>[A-Z][a-z]+) and (?P<b>[A-Z][a-z]+) "
                   r"co-mentored (?P<obj>[A-Z][a-z]+)\.$"),
         "emissions": [
             {"pred": "mentored", "subj_group": "a", "subj_kind": "person",
              "obj_group": "obj", "obj_kind": "person",
              "slot_idx": 0, "clause": "main"},
             {"pred": "mentored", "subj_group": "b", "subj_kind": "person",
              "obj_group": "obj", "obj_kind": "person",
              "slot_idx": 1, "clause": "main"}]},
    ],
    "findings_rules": [
        {"rule": "mentorship", "severity": "info",
         "pattern": " mentored ", "evidence": "text"},
    ],
    "extra_flows": [
        {"a_kind": "person", "a_norm": "alice",
         "b_kind": "org", "b_norm": "shadowcorp"},
    ],
}


def test_load_validation(tmp_path):
    p = tmp_path / "sem.json"
    p.write_text(json.dumps(CFG))
    sem = C.load_semantics(str(p))
    assert sem.templates[0][0] == "mentored"
    bad = dict(CFG, templates=[{"pred": "x", "regex": "no groups",
                                "subj_kind": "person", "obj_kind": "org"}])
    with pytest.raises(ValueError, match="named"):
        C.parse_semantics(bad)
    bad2 = dict(CFG, extra_flows=[{"a_kind": "wat", "a_norm": "x",
                                   "b_kind": "org", "b_norm": "y"}])
    with pytest.raises(ValueError, match="unknown kind"):
        C.parse_semantics(bad2)


def test_config_template_extracts(ray_session):
    from joern_ray.stages import extract as X
    sem = C.parse_semantics(CFG)
    rows = [dict(conv_id="c1", turn_idx=0, role="user",
                 text="Alice mentored Bob.", tool=None, ts=0),
            dict(conv_id="c1", turn_idx=1, role="user",
                 text="Alice works at Acme Corp.", tool=None, ts=0)]
    ds = ray.data.from_arrow(_mk(rows))
    out = X.extract_triples(ds, extra_templates=sem.templates).take_all()
    preds = {r["pred"] for r in out}
    assert {"mentored", "works_at"} <= preds
    m = [r for r in out if r["pred"] == "mentored"][0]
    assert (m["subj"], m["obj"]) == ("Alice", "Bob")


def test_config_multi_template_extracts(ray_session):
    """External multi-relation template: one sentence, two emissions with
    distinct slot_idx (the querydb-plugin analog for nested constructs)."""
    from joern_ray.stages import extract as X
    sem = C.parse_semantics(CFG)
    rows = [dict(conv_id="c1", turn_idx=0, role="user",
                 text="Alice and Carol co-mentored Bob.", tool=None, ts=0)]
    ds = ray.data.from_arrow(_mk(rows))
    out = X.extract_triples(
        ds, extra_multi_templates=sem.multi_templates).take_all()
    got = sorted((r["subj"], r["pred"], r["obj"], r["slot_idx"])
                 for r in out)
    assert got == [("Alice", "mentored", "Bob", 0),
                   ("Carol", "mentored", "Bob", 1)]
    bad = dict(CFG, multi_templates=[
        {"name": "x", "regex": r"^(?P<a>[A-Z][a-z]+)$",
         "emissions": [{"pred": "p", "subj_group": "a",
                        "subj_kind": "person", "obj_group": "missing",
                        "obj_kind": "person"}]}])
    with pytest.raises(ValueError, match="unknown capture group"):
        C.parse_semantics(bad)


def test_config_findings_rule(ray_session):
    from joern_ray.pipelines import findings as F
    sem = C.parse_semantics(CFG)
    rows = [dict(conv_id="c1", turn_idx=0, role="user",
                 text="Alice mentored Bob.", tool=None, ts=0)]
    ds = ray.data.from_arrow(_mk(rows))
    out = F.scan(ds, extra_rules=C.config_findings_rules(sem)).take_all()
    assert any(r["rule"] == "mentorship" for r in out)


def test_config_extra_flows(ray_session):
    from joern_ray.stages import extract as X
    from joern_ray.stages import reach as RCH
    sem = C.parse_semantics(CFG)
    rows = [dict(conv_id="c1", turn_idx=0, role="user",
                 text="Alice works at Acme Corp.", tool=None, ts=0)]
    triples = X.extract_triples(ray.data.from_arrow(_mk(rows)))
    base = {(r["kind"], r["norm"])
            for r in RCH.reachable(triples, [("person", "alice")],
                                   max_depth=2).take_all()}
    assert ("org", "shadowcorp") not in base
    ext = {(r["kind"], r["norm"])
           for r in RCH.reachable(triples, [("person", "alice")],
                                  max_depth=2,
                                  extra_flows=sem.extra_flows).take_all()}
    assert ("org", "shadowcorp") in ext
