"""Dominator / post-dominator / CDG operators on branching DAGs (the
transcripts' NEXT_TURN chains are degenerate; the operator is generic)."""

import pyarrow as pa

import ray.data

from joern_ray.stages import dom as D


def _edges(rows):
    return ray.data.from_arrow(pa.table({
        "src": [r[0] for r in rows], "dst": [r[1] for r in rows],
        "conv_id": [r[2] for r in rows]}))


DIAMOND = [("a", "b", "c1"), ("a", "c", "c1"),
           ("b", "d", "c1"), ("c", "d", "c1")]


def test_dominators_diamond(ray_session):
    out = {r["node"]: r["idom"]
           for r in D.dominators(_edges(DIAMOND)).take_all()}
    assert out == {"a": None, "b": "a", "c": "a", "d": "a"}


def test_post_dominators_diamond(ray_session):
    out = {r["node"]: r["idom"]
           for r in D.post_dominators(_edges(DIAMOND)).take_all()}
    assert out == {"d": None, "b": "d", "c": "d", "a": "d"}


def test_cdg_diamond(ray_session):
    out = {(r["ctrl"], r["node"])
           for r in D.control_dependence(_edges(DIAMOND)).take_all()}
    # b and c execute only if a branches to them; d always runs
    assert out == {("a", "b"), ("a", "c")}


def test_dominators_chain(ray_session):
    chain = [("t0", "t1", "c2"), ("t1", "t2", "c2")]
    out = {r["node"]: r["idom"]
           for r in D.dominators(_edges(chain)).take_all()}
    assert out == {"t0": None, "t1": "t0", "t2": "t1"}


def test_multi_conversation_partitioning(ray_session):
    rows = DIAMOND + [("x", "y", "c9")]
    out = D.dominators(_edges(rows)).take_all()
    assert {r["conv_id"] for r in out} == {"c1", "c9"}
    c9 = {r["node"]: r["idom"] for r in out if r["conv_id"] == "c9"}
    assert c9 == {"x": None, "y": "x"}
