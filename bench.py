"""Benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N}

``bench.py --scaling`` runs the headline KG pipeline twice in FRESH
processes (num_cpus=8 then num_cpus=32) on identical input and reports
throughput at both plus scaling efficiency  tp(32) / (4 * tp(8))  — the
sandbox proxy for the N→4N-node criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")


def _consume(res) -> int:
    """Fully execute a Dataset / frame; return its row count."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pa.Table, pd.DataFrame)):
        return len(res)
    return 0


def _count_rows(path: str) -> int:
    import pyarrow.dataset as pads
    return pads.dataset(path, format="parquet").count_rows()


def headline(sf_dir: str) -> dict:
    """Flagship KG build: transcripts → triples/entities/nodes/edges,
    consumed by a partitioned parquet write (the real sink)."""
    import shutil

    from joern_ray import synth
    from joern_ray.pipelines import kg

    tp = os.environ.get("GRAFT_BENCH_TRANSCRIPTS") \
        or synth.transcripts_path(sf_dir)
    n_turns = _count_rows(tp)

    out = "/tmp/joern_ray_bench_out"
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.perf_counter()
    # GRAFT_FUSED_RECOVERY=1 routes the build through the fused
    # resolver+kindrec-stage-1 exchange for scale-level A/Bs
    res = kg.build_from_path(
        tp, fused_recovery=bool(int(os.environ.get(
            "GRAFT_FUSED_RECOVERY", "0"))))
    n_triples = res["triples_canonical"].count()
    # snappy: measured 4x faster sink than zstd on these tables (the sink
    # is compression-CPU-bound, not disk-bound: zstd 40.6s vs snappy 10.9s
    # for the 190M-row edge table at 32 cores; zstd is ~40% smaller — a
    # storage-policy knob, not a throughput default).  min_rows_per_file
    # keeps output at ~50-100MB files instead of 1,280 per-block shards.
    # (Sinks run sequentially: driving both from threads trips a
    # thread-unsafe lazy fsspec import inside Ray's path resolution when
    # aiohttp is absent, and measured no wall-time win anyway.)
    res["nodes"].write_parquet(os.path.join(out, "nodes"),
                               compression="snappy",
                               min_rows_per_file=2_000_000)
    res["edges"].write_parquet(os.path.join(out, "edges"),
                               compression="snappy",
                               min_rows_per_file=4_000_000)
    dt = time.perf_counter() - t0
    return dict(sec=dt, turns=n_turns, triples=n_triples,
                turns_per_sec=n_turns / dt)


def run_queries(sf_dir: str) -> dict[str, float]:
    """Per-pipeline wall time for the representative operator set."""
    import __ray_entry__ as E
    qs = E.queries()
    picks = [
        "kg_triples_surface", "kg_triples_canonical", "kg_nodes", "kg_edges",
        "rel_q1_pricing", "rel_revenue_by_nation", "rel_topk_orders",
        "text_stats", "text_lang_id", "dedup_exact", "dedup_minhash",
        "dedup_simhash", "ann_topk", "ann_lsh", "multimodal_features",
        "kg_findings", "text_sample_stratified", "text_token_bins",
        "events_sliding_counts",
    ]
    out: dict[str, float] = {}
    for name in picks:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        _consume(qs[name](sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


# the round-2 bench suite for like-for-like round-over-round comparison:
# round 3 ADDED kg_findings (the 50-rule scan battery, absent from the r2
# suite) and three training-data ops, so the full-suite total is a
# superset — "value_r2_subset" restates this run over exactly the r2
# picks (BENCH_r02: 16 queries, 37.9 s).
R2_PICKS = [
    "kg_build_headline", "kg_triples_surface", "kg_triples_canonical",
    "kg_nodes", "kg_edges", "rel_q1_pricing", "rel_revenue_by_nation",
    "rel_topk_orders", "text_stats", "text_lang_id", "dedup_exact",
    "dedup_minhash", "dedup_simhash", "ann_topk", "ann_lsh",
    "multimodal_features",
]


def main_single(num_cpus: int, headline_only: bool) -> dict:
    _init_ray(num_cpus)
    h = headline(SF_DIR)
    queries = {} if headline_only else run_queries(SF_DIR)
    total = h["sec"] + sum(queries.values())
    r2_subset = h["sec"] + sum(v for k, v in queries.items()
                               if k in R2_PICKS)
    rec = {
        "metric": "kg-build+operator-suite wall time",
        "value": round(total, 3),
        "value_r2_subset": round(r2_subset, 3),
        "unit": "sec",
        "queries": {"kg_build_headline": round(h["sec"], 3), **queries},
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "headline_turns": h["turns"],
        "headline_triples": h["triples"],
        "headline_turns_per_sec": round(h["turns_per_sec"], 1),
    }
    return rec


def main_scaling() -> dict:
    """Two fresh processes at 8 and 32 CPUs on identical input.

    The input is a bench-scale corpus (default 60k conversations, ~1M
    turns) so the run is compute-bound — at sf0.1 size the headline is
    dominated by fixed stage latency and measures nothing about scaling.
    Generated Ray-parallel once (cached), then both sub-runs read it."""
    n_convs = int(os.environ.get("GRAFT_SCALING_CONVS", "4000000"))
    _init_ray(NUM_CPUS)
    from joern_ray import synth
    tdir = synth.ensure_corpus_parallel(n_convs, f"scaling{n_convs}")
    import ray
    ray.shutdown()

    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "2"))
    lo, hi = (int(x) for x in
              os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(","))
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for trial in range(trials):
        for cpus in (lo, hi):
            # flush prior run's dirty pages, then cool down — pending
            # writeback of the previous trial's ~GB output is the main
            # single-box noise source
            os.sync()
            time.sleep(15)
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                       GRAFT_SF_DIR=SF_DIR, GRAFT_BENCH_TRANSCRIPTS=tdir)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one"],
                env=env, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode != 0 or not lines:
                raise RuntimeError(
                    f"scaling sub-run (cpus={cpus}) failed "
                    f"rc={p.returncode}; stderr tail:\n"
                    + "\n".join(p.stderr.splitlines()[-20:]))
            runs[cpus].append(json.loads(lines[-1]))
    best_lo = max(runs[lo], key=lambda r: r["headline_turns_per_sec"])
    best_hi = max(runs[hi], key=lambda r: r["headline_turns_per_sec"])
    tp_lo = best_lo["headline_turns_per_sec"]
    tp_hi = best_hi["headline_turns_per_sec"]
    eff = tp_hi / ((hi / lo) * tp_lo)
    return {
        "metric": f"kg-build scaling efficiency ({lo} vs {hi} cpus, fresh "
                  f"sessions, best of {trials})",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {f"turns_per_sec_{lo}cpu": tp_lo,
                    f"turns_per_sec_{hi}cpu": tp_hi,
                    f"sec_{lo}cpu": best_lo["queries"]["kg_build_headline"],
                    f"sec_{hi}cpu": best_hi["queries"]["kg_build_headline"],
                    f"all_sec_{lo}cpu": [r["queries"]["kg_build_headline"]
                                         for r in runs[lo]],
                    f"all_sec_{hi}cpu": [r["queries"]["kg_build_headline"]
                                         for r in runs[hi]]},
        "sf": SF_DIR,
        "num_cpus": hi,
        "headline_turns": best_hi["headline_turns"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        rec = main_scaling()
    elif "--one" in sys.argv:
        rec = main_single(NUM_CPUS, headline_only=True)
    else:
        rec = main_single(NUM_CPUS, headline_only=False)
    print(json.dumps(rec))
    import ray
    if ray.is_initialized():
        ray.shutdown()
