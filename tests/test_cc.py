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
