"""External-tool (subprocess) extraction — the AstGenRunner analog.

Dual-run equivalence: the actor-pool subprocess path (serial oracle logic
behind a JSONL pipe) must produce the same event set as the in-process
vectorized kernel (``extract.extract_events``) — the two implementations
share only the rule pack, mirroring the reference's astgen-vs-frontend
dual representation (``AstGenRunner.scala:120-210``).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from joern_ray import synth
from joern_ray.stages import extract as X
from joern_ray.stages.external_tool import (ExternalToolExtractor,
                                            extract_events_external)


def _ev_key(r):
    return (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"],
            r["subj_kind"], r["obj_kind"], r["sent_idx"], r["negated"],
            r["in_question"], r["is_past"], r["slot_idx"], r["clause"])


def test_external_tool_matches_vectorized_kernel(ray_session):
    t, _ = synth.generate_corpus(120)
    ds = ray.data.from_arrow(t).repartition(4)
    ext = extract_events_external(ds, concurrency=2, batch_size=256)
    inproc = ds.map_batches(X.extract_events, batch_format="pyarrow")
    nskey = lambda k: tuple((v is None, v) for v in k)  # noqa: E731
    a = sorted((_ev_key(r) for r in ext.take_all()), key=nskey)
    b = sorted((_ev_key(r) for r in inproc.take_all()), key=nskey)
    assert a == b
    assert len(a) > 0


def test_external_tool_respawns_dead_subprocess():
    ex = ExternalToolExtractor()
    ex._proc.kill()
    ex._proc.wait()
    batch = pa.table({
        "conv_id": ["c1"], "turn_idx": pa.array([0], pa.int32()),
        "role": ["user"], "text": ["Alice works at Acme Corp."],
        "tool": pa.nulls(1, pa.string()),
    })
    out = ex(batch)
    assert out.num_rows == 1
    assert out.column("pred").to_pylist() == ["works_at"]
