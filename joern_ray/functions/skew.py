"""Explicit hot-key skew handling (SURVEY.md §4).

Zipfian mention distributions put most rows on a few keys; a plain
``groupby(key)`` funnels every hot-key row into one reducer.  The engine's
first defense is per-batch partial aggregation (used by vocab, mention
counts, window counts).  When the *values* must be grouped (not just
reduced), use salting: hot keys — detected with a cheap two-phase count —
are split across ``key#0..k-1`` salt groups, processed per salt, and the
per-salt partials combined in a second (now small) exchange.

Reference analog: the bail-out thresholds guarding pathological units
(``ReachingDefPass.scala:40-52``) — here the pathological key is split
instead of skipped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

DEFAULT_HOT_THRESHOLD = 100_000
DEFAULT_N_SALTS = 16


def key_counts(ds: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
    """Two-phase row count per key (combiner first — safe on skew)."""
    def partial(t: pa.Table) -> pa.Table:
        return (t.select([key]).group_by(key)
                .aggregate([(key, "count")]).rename_columns([key, "n"]))
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key).aggregate(Sum(on="n", alias_name="n")))


def hot_keys(ds: "ray.data.Dataset", key: str,
             threshold: int = DEFAULT_HOT_THRESHOLD) -> set:
    """Keys with more than ``threshold`` rows (result is tiny: Zipf tails
    are long but heads are short — broadcastable by construction)."""
    counts = key_counts(ds, key)
    out = set()
    for b in counts.iter_batches(batch_format="pyarrow"):
        if b.num_columns == 0:
            continue
        hot = b.filter(pc.greater(b.column("n"), threshold))
        out.update(hot.column(key).to_pylist())
    return out


def with_salt(ds: "ray.data.Dataset", key: str, hot: set,
              *, n_salts: int = DEFAULT_N_SALTS) -> "ray.data.Dataset":
    """Append a ``salt`` column: rows of hot keys spread uniformly over
    0..n_salts-1 (deterministic per row index hash), cold keys salt 0.
    Group on (key, salt), then combine per-key partials."""
    href = ray.put(hot)

    def fn(t: pa.Table) -> pa.Table:
        h = ray.get(href)
        keys_np = t.column(key).to_pylist()
        is_hot = np.fromiter((k in h for k in keys_np), dtype=bool,
                             count=len(keys_np))
        salt = np.zeros(len(keys_np), dtype=np.int64)
        if is_hot.any():
            idx = np.nonzero(is_hot)[0]
            salt[idx] = idx % n_salts
        return t.append_column("salt", pa.array(salt))
    return ds.map_batches(fn, batch_format="pyarrow")


def salted_count(ds: "ray.data.Dataset", key: str,
                 *, threshold: int = DEFAULT_HOT_THRESHOLD,
                 n_salts: int = DEFAULT_N_SALTS) -> "ray.data.Dataset":
    """Reference composition: detect hot keys → salt → per-(key, salt)
    count → combine to per-key totals."""
    hot = hot_keys(ds, key, threshold)
    salted = with_salt(ds, key, hot, n_salts=n_salts)

    def partial(t: pa.Table) -> pa.Table:
        return (t.select([key, "salt"]).group_by([key, "salt"])
                .aggregate([("salt", "count")])
                .rename_columns([key, "salt", "n"]))

    return (salted.map_batches(partial, batch_format="pyarrow")
            .groupby(key).aggregate(Sum(on="n", alias_name="n")))
