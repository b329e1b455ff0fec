"""Pinned-grammar A/B (VERDICT r3 #5): single-core extract_events
throughput over identical sf0.1 text, full v11 pack vs the v7-era pack
(pin = drop the v8 multi-templates, v9 object-pronoun templates, and the
v10/v11 fused mentioned arm).  In-process (no Ray workers), so module
monkeypatching is sound; best-of-N wall per arm isolates grammar cost
from the box's ambient noise and from every distribution effect.

Usage: python scripts/bisect_grammar.py [n_trials]
"""

from __future__ import annotations

import re
import sys
import time

import pyarrow.parquet as pq

from joern_ray import synth
from joern_ray.functions import rules as R
from joern_ray.stages import extract as X

SF = "/root/testdata/sf0.1"
V8_MULTIS = {"coord3_works_at", "quoted_coord_uses"}


def run(table, trials: int) -> tuple[float, int]:
    best, n_events = float("inf"), 0
    batches = table.to_batches(max_chunksize=64 * 1024)
    import pyarrow as pa
    tables = [pa.Table.from_batches([b]) for b in batches]
    for _ in range(trials):
        t0 = time.perf_counter()
        n_events = sum(X.extract_events(t).num_rows for t in tables)
        best = min(best, time.perf_counter() - t0)
    return best, n_events


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tp = synth.transcripts_path(SF)
    table = pq.read_table(tp, columns=["conv_id", "turn_idx", "role",
                                       "text", "tool"])
    n = table.num_rows

    full_sec, full_ev = run(table, trials)

    # pin to the v7-era grammar
    saved = (R.MULTI_TEMPLATES, R.PRONOUN_OBJECT_TEMPLATES,
             R.MULTI_TEMPLATE_LITERALS, X._ANY_LITERAL_RE,
             R.MENTIONED_LITERAL)
    try:
        R.MULTI_TEMPLATES = [m for m in R.MULTI_TEMPLATES
                             if m[0] not in V8_MULTIS]
        R.MULTI_TEMPLATE_LITERALS = {
            k: v for k, v in R.MULTI_TEMPLATE_LITERALS.items()
            if k not in V8_MULTIS}
        R.PRONOUN_OBJECT_TEMPLATES = []
        # disable the fused mentioned arm via an unmatchable literal
        R.MENTIONED_LITERAL = "\x00never\x00"
        X._ANY_LITERAL_RE = "|".join(
            re.escape(lit) for lit in X._flat_literals(
                list(X._TEMPLATE_LITERALS.values())
                + list(R.MULTI_TEMPLATE_LITERALS.values())))
        pin_sec, pin_ev = run(table, trials)
    finally:
        (R.MULTI_TEMPLATES, R.PRONOUN_OBJECT_TEMPLATES,
         R.MULTI_TEMPLATE_LITERALS, X._ANY_LITERAL_RE,
         R.MENTIONED_LITERAL) = saved

    print(f"rows={n} trials={trials}")
    print(f"full(v11): {full_sec:.2f}s  {n/full_sec/1000:.0f}k rows/s  "
          f"{full_ev} events")
    print(f"pinned(v7): {pin_sec:.2f}s  {n/pin_sec/1000:.0f}k rows/s  "
          f"{pin_ev} events")
    print(f"grammar cost: {100*(full_sec-pin_sec)/pin_sec:.1f}% kernel "
          f"wall (+{full_ev-pin_ev} events)")


if __name__ == "__main__":
    main()
