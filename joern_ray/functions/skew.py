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


def salted_multikey_count(ds: "ray.data.Dataset", keys: list[str],
                          alias: str, *, n_salts: int | None = None
                          ) -> "ray.data.Dataset":
    """Two- or three-phase distributed count per composite key.

    n_salts=None: per-batch partial → one global groupby (the default; the
    combiner alone bounds any key's reducer input to n_blocks rows).
    n_salts=k: per-batch partial rows get a deterministic salt (partial-row
    ordinal % k) and reduce in TWO exchanges — (keys, salt) then (keys) —
    so at extreme block counts (100k+ blocks at 100 TB) a Zipf-head key's
    per-block partials tree-reduce across k reducers instead of funneling
    into one.  Results are identical by associativity of sum.
    """
    def partial(t: pa.Table) -> pa.Table:
        out = (t.select(keys).group_by(keys)
               .aggregate([(keys[-1], "count")])
               .rename_columns([*keys, "n"]))
        if n_salts:
            salt = pa.array(np.arange(out.num_rows, dtype=np.int64)
                            % n_salts)
            out = out.append_column("salt", salt)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if n_salts:
        partials = (partials.groupby([*keys, "salt"])
                    .aggregate(Sum(on="n", alias_name="n"))
                    .map_batches(lambda t: (t.select([*keys, "n"])
                                            if t.num_columns else t),
                                 batch_format="pyarrow"))
    out = partials.groupby(keys).aggregate(Sum(on="n", alias_name=alias))
    empty = pa.schema([*[(k, pa.string()) for k in keys],
                       (alias, pa.int64())])
    return out.map_batches(
        lambda t: (t.select([*keys, alias]) if t.num_columns
                   else empty.empty_table()),
        batch_format="pyarrow")


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
