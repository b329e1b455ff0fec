"""Hot-key detection + salted aggregation equivalence."""

import collections

import pyarrow as pa

import ray.data

from joern_ray.functions import skew


def _skewed_ds():
    keys = ["hot"] * 5000 + [f"cold{i % 50}" for i in range(1000)]
    return ray.data.from_arrow(pa.table({"k": keys})).repartition(8)


def test_hot_key_detection(ray_session):
    ds = _skewed_ds()
    assert skew.hot_keys(ds, "k", 2000) == {"hot"}
    assert skew.hot_keys(ds, "k", 100_000) == set()


def test_salted_count_equals_plain_count(ray_session):
    ds = _skewed_ds()
    got = {r["k"]: r["n"]
           for r in skew.salted_count(ds, "k", threshold=2000).take_all()}
    want = collections.Counter(
        ["hot"] * 5000 + [f"cold{i % 50}" for i in range(1000)])
    assert got == dict(want)


def test_salt_spreads_hot_key(ray_session):
    ds = _skewed_ds()
    salted = skew.with_salt(ds, "k", {"hot"}, n_salts=8)
    per_salt = collections.Counter(
        (r["k"], r["salt"]) for r in salted.take_all() if r["k"] == "hot")
    assert len(per_salt) == 8
    assert max(per_salt.values()) < 5000  # no single group holds the key


def test_salted_multikey_count_planted_hot_key(ray_session):
    """10^6-row hot key: salted 3-phase count == plain 2-phase count."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from joern_ray.functions.skew import salted_multikey_count

    n_hot = 1_000_000
    kinds = ["person"] * n_hot + ["person", "tool", "tool"]
    norms = ["alice"] * n_hot + ["bob", "search", "search"]
    t = pa.table({"kind": pa.array(kinds, pa.string()),
                  "norm": pa.array(norms, pa.string())})
    ds = ray.data.from_arrow(t).repartition(16)

    def rows(out):
        return sorted((r["kind"], r["norm"], r["n"]) for r in out.take_all())

    plain = rows(salted_multikey_count(ds, ["kind", "norm"], "n"))
    salted = rows(salted_multikey_count(ds, ["kind", "norm"], "n",
                                        n_salts=8))
    assert plain == salted
    assert ("person", "alice", n_hot) in plain
    assert ("tool", "search", 2) in plain
