"""Kind recovery (XTypeRecovery analog): planted three-regime golden,
round-1/round-2 precedence, strategy equivalence, canonical rewrite."""

import pyarrow as pa

import ray.data

from joern_ray import schema as S
from joern_ray.stages import kindrec as KR


def _tds(rows):
    # rows: (conv_id, turn_idx, role, text)
    return ray.data.from_arrow(pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "tool": pa.array([None] * len(rows), pa.string()),
    }))


_ROWS = [
    # conv A: local evidence (org typed in the same conv) → round 1
    ("a", 0, "user", "Bob works at Acme Corp."),
    ("a", 1, "assistant", "Alice mentioned Acme Corp."),
    # conv B: 'search' typed ONLY in conv A's sibling below → round 2
    ("b", 0, "user", "Alice mentioned search."),
    # conv C: global evidence source for 'search'
    ("c", 0, "user", "Carol uses search daily."),
    # conv D: never-typed surface → unrecovered stub, round 0
    ("d", 0, "user", "Alice mentioned Quokka Ventures."),
]


def _recover(strategy="auto"):
    t = KR.recover(_tds(_ROWS), strategy=strategy)
    return {(r["conv_id"], r["surface"]): (r["kind"], r["round"])
            for r in t.to_pylist()}


def test_kindrec_three_regimes(ray_session):
    got = _recover()
    assert got[("a", "Acme Corp")] == ("org", 1)
    assert got[("b", "search")] == ("tool", 2)
    assert got[("d", "Quokka Ventures")] == ("unknown", 0)
    assert len(got) == 3


def test_kindrec_local_scope_wins_over_global(ray_session):
    """Closest scope first: same surface typed differently in the
    mention's own conv vs elsewhere — conv-local kind wins even when the
    global min(kind) differs."""
    rows = [
        # 'browser' typed TOOL in conv x (local to the mention)
        ("x", 0, "user", "Bob uses browser daily."),
        ("x", 1, "user", "Alice mentioned browser."),
        # elsewhere the same surface appears as a module (dirty input),
        # and 'module' < 'tool' lexicographically — global would pick it
        ("y", 0, "user", "Carol reported a bug in browser."),
    ]
    t = KR.recover(_tds(rows))
    got = {(r["conv_id"], r["surface"]): (r["kind"], r["round"])
           for r in t.to_pylist()}
    assert got[("x", "browser")] == ("tool", 1)


def test_kindrec_strategy_equivalence(ray_session):
    # 'cogroup' = the fully distributed 2-exchange chain
    assert _recover("broadcast") == _recover("cogroup")


def test_recovered_triples_distributed_dispatch(ray_session, monkeypatch):
    """Beyond DRIVER_MAX_UNKNOWNS, recovered_triples streams from the
    distributed chain — same rows as the driver path."""
    drv = sorted((r["conv_id"], r["subj"], r["obj"], r["obj_kind"])
                 for r in KR.recovered_triples(_tds(_ROWS)).take_all())
    monkeypatch.setattr(KR, "DRIVER_MAX_UNKNOWNS", 0)
    dist = sorted((r["conv_id"], r["subj"], r["obj"], r["obj_kind"])
                  for r in KR.recovered_triples(_tds(_ROWS)).take_all())
    assert drv == dist and len(drv) == 2


def test_kindrec_rewrites_into_canonical(ray_session):
    """Recovered mentions reach canonical triples with linked canonicals;
    unrecovered stubs are dropped; the surface-triple stream and entity
    vocabulary stay untouched."""
    from joern_ray.pipelines import kg

    res = kg.build_graph(_tds(_ROWS))
    canon = [r for r in res["triples_canonical"].take_all()
             if r["pred"] == "mentioned"]
    got = {(r["conv_id"], r["subj_canonical"], r["obj_kind"],
            r["obj_canonical"]) for r in canon}
    assert ("a", "alice", "org", "acme") in got
    assert ("b", "alice", "tool", "search") in got
    assert all(r["obj_canonical"] != "quokka ventures" for r in canon)
    assert len(got) == 2
    # surface stream untouched
    surf = res["triples_surface"].take_all()
    assert all(r["pred"] != "mentioned" for r in surf)
    # entity vocabulary untouched: no entity for the never-typed surface
    ents = res["entities"].take_all()
    assert all("quokka" not in (e["norm"] or "") for e in ents)


def test_kindrec_untyped_extractor_shape(ray_session):
    t = pa.concat_tables([
        KR.untyped_mentions_batch(b) for b in
        _tds(_ROWS).iter_batches(batch_format="pyarrow")])
    assert t.schema.equals(KR.UNTYPED)
    assert t.num_rows == 3
    # pronoun subjects excluded (mirrors the template arms)
    t2 = KR.untyped_mentions_batch(pa.table({
        "conv_id": ["z"], "turn_idx": pa.array([0], pa.int32()),
        "role": ["user"], "text": ["She mentioned Acme Corp."],
        "tool": pa.array([None], pa.string())}))
    assert t2.num_rows == 0
