"""Per-stage Ray Data stats audit for the headline KG build.

The "measure, don't guess" loop: run the flagship build on a chosen sf
directory and print each consumed Dataset's ``ds.stats()`` — per-operator
wall time, CPU time, blocks, and output rows — so a regression in any
stage is visible as a stage, not a lump-sum wall time.  Use next to
``bench.py`` (which records wall time only):

    python scripts/stats_audit.py                # sf0.1
    python scripts/stats_audit.py /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    try:
        from joern_ray import synth
        from joern_ray.pipelines import kg

        tp = synth.transcripts_path(sf_dir)
        out = "/tmp/joern_ray_stats_out"
        shutil.rmtree(out, ignore_errors=True)

        t0 = time.perf_counter()
        res = kg.build_from_path(tp)
        for name in ("nodes", "edges"):
            ds = res[name]
            ds.write_parquet(os.path.join(out, name), compression="snappy",
                             min_rows_per_file=2_000_000)
            print(f"\n======== {name} ========")
            print(ds.stats())
        print(f"\ntotal wall: {time.perf_counter() - t0:.2f}s "
              f"(nodes+edges consumed; canonical triples are shared "
              f"upstream of both and appear in each stats tree)")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
