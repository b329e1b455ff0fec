"""Checkpoint/resume ledger with per-stage lineage.

Analog of the reference's overlay ledger: each completed layer appends its
name to ``metaData.overlays`` (``Overlays.scala:10-46``) and tools skip
already-applied layers (``CpgBasedTool.addDataFlowOverlayIfNonExistent:26-33``).
Here every stage writes partitioned Parquet under ``out_dir/<stage>/`` and a
lineage record under ``out_dir/_manifest/<stage>.json`` only after the write
completes — a crash mid-stage leaves no record, so the re-run rebuilds that
stage (idempotently: the stage dir is cleared first) and skips everything
already recorded.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def dataset_fingerprint(ds: "ray.data.Dataset") -> str:
    """Order-insensitive, partitioning-independent content hash: XOR of
    per-row hashes + row count (columns sorted by name)."""
    def per_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        df = t.select(sorted(t.column_names)).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype="uint64")
        xor = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"h": pa.array([int(xor) - (1 << 63)], pa.int64()),
                         "n": pa.array([len(h)], pa.int64())})
    rows = ds.map_batches(per_batch, batch_format="pyarrow").take_all()
    xor_all = 0
    for r in rows:
        xor_all ^= (r["h"] + (1 << 63))
    return f"{xor_all:016x}:{sum(r['n'] for r in rows)}"


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.mdir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.mdir, exist_ok=True)

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def record_path(self, name: str) -> str:
        return os.path.join(self.mdir, f"{name}.json")

    def is_done(self, name: str) -> bool:
        return os.path.exists(self.record_path(name))

    def read_record(self, name: str) -> dict:
        with open(self.record_path(name)) as f:
            return json.load(f)

    def completed_stages(self) -> list[str]:
        return sorted(f[:-5] for f in os.listdir(self.mdir)
                      if f.endswith(".json"))

    def run_stage(
        self,
        name: str,
        build: Callable[[], "ray.data.Dataset"],
        *,
        deps: list[str] | None = None,
        fingerprint: bool = False,
        shard_by: str | None = None,
        n_shards: int = 64,
    ) -> "ray.data.Dataset":
        """Build-or-skip one stage.  On skip, the stage output is re-read
        from its Parquet checkpoint (lineage cut — downstream work never
        recomputes upstream stages).

        shard_by: hash-shard the output on this column into
        ``shard=0..n_shards-1`` partition directories (resumable-output
        layout: a downstream consumer or a re-export can skip finished
        shard directories; never one giant file)."""
        sdir = self.stage_dir(name)

        def read_back():
            out = ray.data.read_parquet(sdir)
            if shard_by is not None:
                out = out.map_batches(
                    lambda t: t.drop_columns(["shard"])
                    if "shard" in t.schema.names else t,
                    batch_format="pyarrow")
            return out

        if self.is_done(name):
            return read_back()
        if os.path.exists(sdir):  # partial output from a crashed run
            shutil.rmtree(sdir)
        t0 = time.perf_counter()
        ds = build()
        if shard_by is not None:
            def add_shard(t: pa.Table) -> pa.Table:
                h = pd.util.hash_array(
                    t.column(shard_by).to_numpy(zero_copy_only=False))
                return t.append_column(
                    "shard", pa.array((h % n_shards).astype("int64")))
            ds = ds.map_batches(add_shard, batch_format="pyarrow")
            ds.write_parquet(sdir, partition_cols=["shard"])
        else:
            ds.write_parquet(sdir)
        out = read_back()
        meta = {
            "stage": name,
            "deps": deps or [],
            "rows": out.count(),
            "duration_s": round(time.perf_counter() - t0, 3),
            "files": sorted(os.listdir(sdir)),
        }
        if fingerprint:
            meta["fingerprint"] = dataset_fingerprint(out)
        tmp = self.record_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self.record_path(name))
        return out
