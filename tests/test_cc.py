"""Connected components: all three strategies must agree exactly."""

import pyarrow as pa
import pytest

import ray.data

from joern_ray.stages.cc import connected_components

EDGES = [("b", "a"), ("c", "b"), ("x", "y"), ("q", "z"), ("z", "m")]
NODES = ["a", "b", "c", "x", "y", "z", "q", "m", "lone"]
WANT = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x",
        "z": "m", "q": "m", "m": "m", "lone": "lone"}


def _datasets():
    edges = ray.data.from_arrow(pa.table(
        {"a": [e[0] for e in EDGES], "b": [e[1] for e in EDGES]}))
    nodes = ray.data.from_arrow(pa.table({"node": NODES}))
    return edges, nodes


@pytest.mark.parametrize("strategy", ["driver", "broadcast", "cogroup"])
def test_cc_strategy_exact(ray_session, strategy):
    edges, nodes = _datasets()
    labels = connected_components(edges, nodes, strategy=strategy)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == WANT, strategy


def test_cc_empty_edges(ray_session):
    edges = ray.data.from_arrow(pa.table(
        {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}))
    nodes = ray.data.from_arrow(pa.table({"node": ["n1", "n2"]}))
    got = {r["node"]: r["label"]
           for r in connected_components(edges, nodes).take_all()}
    assert got == {"n1": "n1", "n2": "n2"}


def test_cc_cogroup_beyond_driver_scale(ray_session):
    """Exercise the distributed cogroup path at a node count ABOVE
    DRIVER_MAX_NODES (the regime it exists for): 210k nodes in 105k
    two-node components, all resolved in one propagation round."""
    import numpy as np

    from joern_ray.stages.cc import DRIVER_MAX_NODES

    n = DRIVER_MAX_NODES + 10_000
    assert n % 2 == 0
    ids = np.arange(n)
    names = np.char.add("n", np.char.zfill(ids.astype(str), 7))
    nodes = ray.data.from_arrow(pa.table({"node": pa.array(names)}))
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array(names[0::2]), "b": pa.array(names[1::2])}))
    labels = connected_components(edges, nodes, strategy="cogroup",
                                  max_iters=3)
    t = pa.concat_tables(
        b for b in labels.iter_batches(batch_format="pyarrow")
        if b.num_columns)
    assert t.num_rows == n
    lab = np.asarray(t.column("label").to_pylist())
    node = np.asarray(t.column("node").to_pylist())
    # every node's label is the even member of its pair
    order = np.argsort(node)
    lab_sorted = lab[order]
    assert (lab_sorted[0::2] == lab_sorted[1::2]).all()
    assert (lab_sorted[0::2] == np.sort(names[0::2])).all()
