"""2x-scale smoke for the round-4 exchange-bearing operators (VERDICT r4
#8): snapshot dedup, funnel, retention, source overlap — the newest
operators with keyed exchanges — run at 128M event rows / 32M document
rows (2x the 64M-turn headline bench scale), recording wall time, output
rows, and PEAK DRIVER RSS, demonstrating no corpus-proportional driver
state (the ``scale_smoke.py`` discipline applied to the operator suite).

Inputs are synthesized deterministically (pure function of the row id —
the synth.py discipline; no external data) into a cached sf-shaped
directory so the ops' ``_p(sf_dir)`` readers work unchanged:

  * events.parquet    — N_EVENTS rows over N_USERS users; event_type
    cycles through the funnel steps + noise types with ts strictly
    increasing per user, so funnel chains and retention cohorts are real.
  * documents.parquet — N_DOCS rows; text drawn from a bounded universe
    so ~3% of NEW docs duplicate a PRIOR-snapshot text (the
    continuous-crawl shape snapshot_dedup exists for); 12 sources with
    overlapping token vocabularies.

Usage: python scripts/scale_smoke_ops.py [n_events] [n_docs]
Prints one JSON line per operator + a summary line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_TS = 1_767_225_600 * 1_000_000     # 2026-01-01 (us)
N_USERS = 2_000_000
DOC_UNIVERSE = 24_000_000               # distinct texts (so dups exist)


def ensure_events(n_rows: int) -> str:
    import numpy as np
    import pyarrow as pa

    import ray.data

    d = f"/tmp/joern_ray_opscale/events_v2_{n_rows}"
    done = os.path.join(d, "_SUCCESS")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    types = np.array(["view", "click", "purchase", "scroll", "hover"],
                     dtype=object)

    def gen(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy()
        uid = (i * np.int64(2654435761)) % N_USERS
        # events spread over 30 days (real retention cohorts/offsets);
        # within a day ts grows with i so funnel chains are real
        day = (i * np.int64(16807)) % 30
        ts = (BASE_TS + day * np.int64(86_400_000_000)
              + i * np.int64(997) + (uid % 7) * np.int64(13))
        et = types[(i % 5).astype(np.int64)]
        return pa.table({
            "event_id": pa.array(i, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array((i % 1000).astype("float64"),
                              pa.float64()),
            "props": pa.array(np.full(len(i), "{}", dtype=object),
                              pa.string()),
        })

    (ray.data.range(n_rows, override_num_blocks=max(64, n_rows // 2_000_000))
     .map_batches(gen, batch_format="pyarrow")
     .write_parquet(os.path.join(d, "events.parquet")))
    with open(done, "w") as f:
        f.write("ok")
    return d


def ensure_docs(n_rows: int) -> str:
    import numpy as np
    import pyarrow as pa

    import ray.data

    d = f"/tmp/joern_ray_opscale/docs{n_rows}"
    done = os.path.join(d, "_SUCCESS")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)

    def gen(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy()
        key = (i * np.int64(11400714819323198485 % (1 << 62))) \
            % DOC_UNIVERSE
        txt = np.array([f"crawl page body {k} tok{k % 97} tok{k % 31}"
                        for k in key], dtype=object)
        src = np.array([f"src{v}" for v in (i % 12)], dtype=object)
        return pa.table({
            "doc_id": pa.array(i, pa.int64()),
            "text": pa.array(txt, pa.string()),
            "lang": pa.array(np.full(len(i), "en", dtype=object),
                             pa.string()),
            "source": pa.array(src, pa.string()),
            "n_chars": pa.array(
                np.char.str_len(txt.astype(str)).astype("int64"),
                pa.int64()),
        })

    (ray.data.range(n_rows, override_num_blocks=max(64, n_rows // 1_000_000))
     .map_batches(gen, batch_format="pyarrow")
     .write_parquet(os.path.join(d, "documents.parquet")))
    with open(done, "w") as f:
        f.write("ok")
    return d


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000_000
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from joern_ray.pipelines import events as EV
    from joern_ray.pipelines import text as T

    ev_dir = ensure_events(n_events)
    doc_dir = ensure_docs(n_docs)

    ops = [
        ("events_funnel", lambda: EV.funnel(ev_dir), n_events),
        ("events_retention", lambda: EV.retention(ev_dir), n_events),
        ("dedup_snapshot", lambda: T.snapshot_dedup(doc_dir), n_docs),
        ("text_source_overlap", lambda: T.source_overlap(doc_dir),
         n_docs),
    ]
    summary = {}
    for name, fn, n_in in ops:
        t0 = time.perf_counter()
        res = fn()
        n_out = res.count()
        sec = time.perf_counter() - t0
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        row = {"op": name, "input_rows": n_in, "output_rows": n_out,
               "sec": round(sec, 1),
               "rows_per_sec": round(n_in / sec),
               "driver_peak_rss_mb_so_far": rss}
        print(json.dumps(row), flush=True)
        summary[name] = row
    print(json.dumps({
        "metric": "2x-scale operator smoke",
        "events_rows": n_events, "doc_rows": n_docs,
        "driver_peak_rss_mb": resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss // 1024,
        "ops": {k: {kk: v[kk] for kk in
                    ("output_rows", "sec", "rows_per_sec")}
                for k, v in summary.items()}}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
