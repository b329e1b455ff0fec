"""2x-scale smoke with driver-memory evidence (VERDICT r3 #9): run the
headline KG build on a corpus DOUBLE the standard 64M-turn bench scale and
record peak driver RSS plus per-stage `ds.stats()` — demonstrating no
corpus-proportional driver state.

Usage: python scripts/scale_smoke.py [n_convs]   (default 8M convs = 128M turns)
Prints one JSON line: {"turns": N, "sec": s, "turns_per_sec": r,
                       "driver_peak_rss_mb": m, ...}
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from joern_ray import synth
    from joern_ray.pipelines import kg

    tdir = synth.ensure_corpus_parallel(n_convs, f"scaling{n_convs}")
    import pyarrow.dataset as pads
    n_turns = pads.dataset(tdir, format="parquet").count_rows()

    out = "/tmp/joern_ray_smoke_out"
    shutil.rmtree(out, ignore_errors=True)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

    t0 = time.perf_counter()
    res = kg.build_from_path(tdir)
    n_triples = res["triples_canonical"].count()
    nodes = res["nodes"]
    nodes.write_parquet(os.path.join(out, "nodes"), compression="snappy",
                        min_rows_per_file=2_000_000)
    edges = res["edges"]
    edges.write_parquet(os.path.join(out, "edges"), compression="snappy",
                        min_rows_per_file=2_000_000)
    sec = time.perf_counter() - t0

    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    stats_path = "/tmp/scale_smoke_stats.txt"
    with open(stats_path, "w") as f:
        f.write("== nodes sink stats ==\n")
        f.write(nodes.stats())
        f.write("\n\n== edges sink stats ==\n")
        f.write(edges.stats())
    print(json.dumps({
        "metric": "2x-scale smoke (headline build + sinks)",
        "turns": n_turns,
        "triples": n_triples,
        "sec": round(sec, 1),
        "turns_per_sec": round(n_turns / sec, 1),
        "driver_rss_before_mb": rss0,
        "driver_peak_rss_mb": peak_mb,
        "stage_stats": stats_path,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
