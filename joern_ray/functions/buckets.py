"""Hash-bucketed grouping — the house discipline for per-key logic.

``ds.groupby(key).map_groups(fn)`` invokes a Python function per KEY; at
corpus scale (millions of conversations / users) that is millions of
interpreter dispatches.  Every per-key stage in this engine instead
co-locates whole key groups into hash(key) BUCKET shards (one Ray group
per bucket) and runs the per-key logic in-process over zero-copy sorted
slices — the same partitioning contract as pronoun resolution and the
canonicalization cogroup (``materialize._cogroup_resolve_pass``).

Shards are many-key: a bucket holds |keys| / n_buckets keys, so Python
dispatch cost is per-bucket, while hot keys still cost only their share
of one shard.  Stages whose in-group logic is expressible as vectorized
kernels (events sessionize / as-of) skip the per-slice loop entirely and
operate on the whole sorted shard.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

DEFAULT_GROUP_BUCKETS = 256


def add_bucket(t: pa.Table, key: str, n_buckets: int) -> pa.Table:
    """Append a deterministic int64 'bucket' column = hash(key) % n."""
    h = pd.util.hash_array(t.column(key).to_numpy(zero_copy_only=False))
    return t.append_column("bucket",
                           pa.array((h % n_buckets).astype("int64")))


def iter_key_slices(t: pa.Table, key: str) -> Iterator[pa.Table]:
    """Yield contiguous per-key sub-tables of a table SORTED by ``key``
    (zero-copy slices; boundaries found with one vectorized comparison)."""
    arr = t.column(key).to_numpy(zero_copy_only=False)
    if len(arr) == 0:
        return
    change = np.flatnonzero(arr[1:] != arr[:-1]) + 1
    bounds = np.concatenate(([0], change, [len(arr)]))
    for i in range(len(bounds) - 1):
        yield t.slice(bounds[i], int(bounds[i + 1] - bounds[i]))


def bucketed_group_map(
    ds: "ray.data.Dataset",
    key: str,
    per_group_fn: Callable[[pa.Table], pa.Table],
    out_schema: pa.Schema,
    *,
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
    in_schema: pa.Schema | None = None,
) -> "ray.data.Dataset":
    """``ds.groupby(key).map_groups(per_group_fn)`` re-expressed shard-wise.

    ``per_group_fn`` receives one whole key group (bucket column already
    stripped) and returns a table with ``out_schema``; it runs as an
    in-process loop over sorted slices of each bucket shard, never as a
    per-key Ray group.  ``in_schema``: schema to substitute for the
    schemaless empty blocks iterated pipelines can produce (defaults to
    trusting upstream batches to carry their schema)."""
    def keyed(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            if in_schema is None:
                raise ValueError(
                    "bucketed_group_map met a schemaless empty block; "
                    "pass in_schema")
            t = in_schema.empty_table()
        return add_bucket(t, key, n_buckets)

    def shard(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"]).sort_by([(key, "ascending")])
        outs = [per_group_fn(s) for s in iter_key_slices(g, key)]
        outs = [o for o in outs if o.num_rows]
        return pa.concat_tables(outs) if outs else out_schema.empty_table()

    return (ds.map_batches(keyed, batch_format="pyarrow")
            .groupby("bucket").map_groups(shard, batch_format="pyarrow"))
