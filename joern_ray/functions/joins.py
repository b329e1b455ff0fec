"""Join helpers: broadcast hash joins for small sides.

The reference links by in-memory FULL_NAME index lookups
(``x2cpg/utils/LinkingUtil.scala:35-100``); the Ray-Data-first analog for a
small build side is: ``ray.put`` the side table ONCE, then run a zero-copy
pyarrow (Acero) hash join inside every ``map_batches`` task — the side table
is fetched from the local object store per task (shared-memory, not
re-shipped per batch).  Large-x-large joins should use ``Dataset.join`` /
groupby cogroups instead.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

import ray
import ray.data


def broadcast_join(
    left_ds: "ray.data.Dataset",
    right_table: pa.Table,
    keys: Sequence[str] | str,
    *,
    right_keys: Sequence[str] | str | None = None,
    join_type: str = "inner",
) -> "ray.data.Dataset":
    """Hash-join each left batch against a broadcast right table.

    join_type: any pyarrow join type — 'inner', 'left outer', 'left semi',
    'left anti', ... (semi/anti are the reference's whereNot/stub-creation
    set-difference patterns, SURVEY.md §2.8).
    """
    if isinstance(keys, str):
        keys = [keys]
    rk = right_keys or keys
    if isinstance(rk, str):
        rk = [rk]
    ref = ray.put(right_table)
    out_schema_hint = None

    def fn(batch: pa.Table) -> pa.Table:
        right = ray.get(ref)
        if batch.num_columns == 0:
            return batch
        return batch.join(right, keys=list(keys), right_keys=list(rk),
                          join_type=join_type)

    del out_schema_hint
    return left_ds.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True)


def table_of(ds_or_path, columns: Sequence[str] | None = None) -> pa.Table:
    """Small-side loader: parquet path → pyarrow Table (column-pruned)."""
    import pyarrow.parquet as pq
    return pq.read_table(ds_or_path, columns=list(columns) if columns else None)
