"""PageRank golden + determinism tests (tiny graphs, hand-checked)."""

import numpy as np
import pyarrow as pa

import ray.data

from joern_ray import schema as S
from joern_ray.stages.pagerank import pagerank


def _triples(rows):
    # rows: (subj, pred, obj) person-person facts in one conversation
    n = len(rows)
    return ray.data.from_arrow(pa.table({
        "conv_id": ["c1"] * n,
        "turn_idx": pa.array(range(n), pa.int32()),
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj": [r[2] for r in rows],
        "subj_kind": ["person"] * n,
        "obj_kind": ["person"] * n,
        "sent_idx": pa.array([0] * n, pa.int32()),
        "negated": [False] * n,
        "in_question": [False] * n,
        "is_past": [False] * n,
        "aspect": ["simple"] * n,
        "since_year": pa.array([None] * n, pa.int32()),
        "hedged": [False] * n,
        "slot_idx": pa.array([0] * n, pa.int32()),
        "clause": ["main"] * n,
    }).cast(S.TRIPLES_SURFACE))


def _ref_pagerank(edges, nodes, iters=15, d=0.85):
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    ow = np.zeros(n)
    for s, t, w in edges:
        ow[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        agg = np.zeros(n)
        for s, t, w in edges:
            if ow[idx[s]] > 0:
                agg[idx[t]] += r[idx[s]] * w / ow[idx[s]]
        dang = r[ow == 0].sum()
        r = (1 - d) / n + d * dang / n + d * agg
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_reference_impl(ray_session):
    rows = [("Alice", "met", "Bob"), ("Bob", "met", "Carol"),
            ("Carol", "met", "Alice"), ("Alice", "met", "Carol")]
    out = {r["entity"]: r["rank"]
           for r in pagerank(_triples(rows)).take_all()}
    edges = [("person:alice", "person:bob", 1),
             ("person:bob", "person:carol", 1),
             ("person:carol", "person:alice", 1),
             ("person:alice", "person:carol", 1)]
    want = _ref_pagerank(edges, sorted(out))
    assert set(out) == set(want)
    for k in out:
        assert abs(out[k] - want[k]) < 1e-12
    # sink-heavy node ranks highest
    assert max(out, key=out.get) == "person:carol"


def test_pagerank_deterministic(ray_session):
    rows = [("Alice", "met", "Bob"), ("Bob", "met", "Carol")] * 3
    a = sorted((r["entity"], r["rank"])
               for r in pagerank(_triples(rows)).take_all())
    b = sorted((r["entity"], r["rank"])
               for r in pagerank(_triples(rows)).take_all())
    assert a == b


def test_pagerank_distributed_fold_equivalence(ray_session):
    """The beyond-driver-bound escape path (groupby('i').sum() contribution
    fold) must produce the same ranks as the driver fold — forced here by
    shrinking the guard below the node count."""
    rows = [("Alice", "met", "Bob"), ("Bob", "met", "Carol"),
            ("Carol", "met", "Dave"), ("Dave", "met", "Alice"),
            ("Alice", "met", "Carol"), ("Bob", "met", "Dave")]
    drv = sorted((r["entity"], r["rank"])
                 for r in pagerank(_triples(rows)).take_all())
    dist = sorted((r["entity"], r["rank"])
                  for r in pagerank(_triples(rows),
                                    driver_max_nodes=1).take_all())
    assert [e for e, _ in drv] == [e for e, _ in dist]
    for (_, a), (_, b) in zip(drv, dist):
        assert abs(a - b) < 1e-12


def test_pagerank_excludes_nonlink_conv_nodes(ray_session):
    """'invoked' triples carry a conv-kind subject; conv keys are
    corpus-sized natural keys and must not enter the (vocabulary-sized)
    PageRank node set (ADVICE r2)."""
    n = 2
    tds = ray.data.from_arrow(pa.table({
        "conv_id": ["c1"] * n,
        "turn_idx": pa.array(range(n), pa.int32()),
        "subj": ["c1", "Alice"],
        "pred": ["invoked", "met"],
        "obj": ["search", "Bob"],
        "subj_kind": ["conv", "person"],
        "obj_kind": ["tool", "person"],
        "sent_idx": pa.array([0] * n, pa.int32()),
        "negated": [False] * n,
        "in_question": [False] * n,
        "is_past": [False] * n,
        "aspect": ["simple"] * n,
        "since_year": pa.array([None] * n, pa.int32()),
        "hedged": [False] * n,
        "slot_idx": pa.array([0] * n, pa.int32()),
        "clause": ["main"] * n,
    }).cast(S.TRIPLES_SURFACE))
    out = {r["entity"]: r["rank"] for r in pagerank(tds).take_all()}
    assert set(out) == {"person:alice", "person:bob"}
