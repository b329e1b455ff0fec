"""Graph-shape metrics: triangle counts / clustering coefficient and
k-core decomposition (joern_ray.stages.graphstats).

Coverage: closed-form golden graph (K4 + pendant path + triangle +
isolated edge), broadcast-vs-cogroup orientation equivalence, and the
h-index k-core fixed point checked against an independent pure-Python
peeling oracle on seeded pseudo-random graphs."""

import numpy as np
import pyarrow as pa
import pytest

from joern_ray.stages.graphstats import kcore, triangles


def _edges_ds(pairs):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.string()),
        "b": pa.array([p[1] for p in pairs], pa.string())}))


GOLDEN = [("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"), ("B", "D"),
          ("C", "D"),                     # K4: tri=3 each, core 3
          ("D", "E"), ("E", "F"),         # pendant path: core 1
          ("G", "H"), ("G", "I"), ("H", "I"),  # triangle: core 2
          ("J", "K")]                     # isolated edge: core 1


def _rows(ds):
    return sorted(tuple(r.values()) for r in ds.take_all())


def test_triangles_golden(ray_session):
    got = _rows(triangles(_edges_ds(GOLDEN)))
    want = sorted([
        ("A", 3, 3, 1000), ("B", 3, 3, 1000), ("C", 3, 3, 1000),
        ("D", 4, 3, 500),   # 2000*3 // (4*3)
        ("E", 2, 0, 0), ("F", 1, 0, 0),
        ("G", 2, 1, 1000), ("H", 2, 1, 1000), ("I", 2, 1, 1000),
        ("J", 1, 0, 0), ("K", 1, 0, 0)])
    assert got == want


def test_triangles_cogroup_equivalence(ray_session):
    """max_broadcast_nodes=0 forces the two-exchange degree-attach path;
    results must be identical to the broadcast orientation."""
    rng = np.random.default_rng(7)
    nodes = [f"n{i:03d}" for i in range(60)]
    pairs = sorted({tuple(sorted(rng.choice(nodes, 2, replace=False)))
                    for _ in range(300)})
    a = _rows(triangles(_edges_ds(pairs)))
    b = _rows(triangles(_edges_ds(pairs), max_broadcast_nodes=0))
    assert a == b and len(a) > 0


def test_triangles_empty(ray_session):
    out = triangles(_edges_ds([]))
    assert out.take_all() == []


def _peel_cores_exact(pairs):
    """Classic exact peeling: core(v) = degeneracy level at removal."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    live = {v: set(ns) for v, ns in adj.items()}
    core = {}
    k = 0
    while live:
        v = min(live, key=lambda x: (len(live[x]), x))
        k = max(k, len(live[v]))
        core[v] = k
        for u in live[v]:
            live[u].discard(v)
        del live[v]
    return core


def test_kcore_golden(ray_session):
    got = dict((r["entity"], r["core"]) for r in kcore(_edges_ds(GOLDEN))
               .take_all())
    want = {"A": 3, "B": 3, "C": 3, "D": 3, "E": 1, "F": 1,
            "G": 2, "H": 2, "I": 2, "J": 1, "K": 1}
    assert got == want


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_kcore_matches_peeling_oracle(ray_session, seed):
    rng = np.random.default_rng(seed)
    nodes = [f"v{i:03d}" for i in range(80)]
    pairs = sorted({tuple(sorted(rng.choice(nodes, 2, replace=False)))
                    for _ in range(240)})
    got = dict((r["entity"], r["core"])
               for r in kcore(_edges_ds(pairs)).take_all())
    assert got == _peel_cores_exact(pairs)


def test_kcore_empty(ray_session):
    assert kcore(_edges_ds([])).take_all() == []
