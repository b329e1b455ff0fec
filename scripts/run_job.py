"""Cluster job entrypoint — the ``joern-parse`` CLI analog.

Run locally:
    python scripts/run_job.py --input /path/transcripts --out /tmp/kg_out

Or against a cluster (fixed-size, any N nodes — the pipeline's partitioning
does not change with cluster size):
    ray job submit --working-dir . -- \
        python scripts/run_job.py --input s3://bucket/transcripts \
                                  --out s3://bucket/kg_out

The build is checkpointed: every stage writes shard-partitioned Parquet +
a lineage record; a resubmitted job skips completed stages (overlay-ledger
resume, ``state/manifest.py``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="transcripts parquet file/dir")
    ap.add_argument("--out", required=True, help="output/checkpoint dir")
    ap.add_argument("--stats", action="store_true",
                    help="print per-stage lineage records when done")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))

    from joern_ray.pipelines import kg

    t0 = time.perf_counter()
    man = kg.build_checkpointed(args.input, args.out)
    dt = time.perf_counter() - t0
    stages = man.completed_stages()
    print(json.dumps({"ok": True, "out": args.out, "stages": stages,
                      "wall_s": round(dt, 2)}))
    if args.stats:
        for s in stages:
            print(json.dumps(man.read_record(s)))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
