"""Stage registry: toposort, user extension, checkpointed execution."""

import pyarrow as pa
import pytest

import ray.data

from joern_ray import synth
from joern_ray.pipelines import kg
from joern_ray.state.registry import Stage, StageRegistry, kg_registry


def test_toposort_order_and_cycles():
    reg = StageRegistry()
    reg.add(Stage("c", lambda d: None, ["b"]))
    reg.add(Stage("b", lambda d: None, ["a"]))
    reg.add(Stage("a", lambda d: None, ["input"]))
    assert [s.name for s in reg.toposort()] == ["a", "b", "c"]
    assert [s.name for s in reg.toposort(["b"])] == ["a", "b"]

    bad = StageRegistry()
    bad.add(Stage("x", lambda d: None, ["y"]))
    bad.add(Stage("y", lambda d: None, ["x"]))
    with pytest.raises(ValueError, match="cycle"):
        bad.toposort()
    with pytest.raises(ValueError, match="duplicate"):
        bad.add(Stage("x", lambda d: None))


def test_kg_registry_runs_and_supports_user_stage(ray_session, sf_small):
    reg = kg_registry()
    # user extension: a custom overlay over a built-in stage's output
    @reg.register("fact_count_by_pred", deps=["triples_canonical"],
                  description="per-predicate fact counts")
    def fact_counts(d):
        from ray.data.aggregate import Count
        return (d["triples_canonical"].groupby("pred")
                .aggregate(Count(alias_name="n")))

    ds = kg.read_transcripts(synth.transcripts_path(sf_small))
    out = reg.run({"transcripts": ds})
    preds = {r["pred"]: r["n"] for r in out["fact_count_by_pred"].take_all()}
    assert preds and all(n > 0 for n in preds.values())
    assert out["nodes"].count() > 0 and out["edges"].count() > 0


def test_registry_checkpoint_skips_on_rerun(ray_session, sf_small, tmp_path):
    import os
    reg = kg_registry()
    ds = kg.read_transcripts(synth.transcripts_path(sf_small))
    out_dir = str(tmp_path / "reg_out")
    reg.run({"transcripts": ds}, targets=["triples_canonical"],
            out_dir=out_dir)
    rec = os.path.join(out_dir, "_manifest", "triples_canonical.json")
    m1 = os.path.getmtime(rec)
    reg2 = kg_registry()
    reg2.run({"transcripts": ds}, targets=["triples_canonical"],
             out_dir=out_dir)
    assert os.path.getmtime(rec) == m1


def test_query_cli_runs_and_writes_parquet(tmp_path):
    # the joern --script analog: run a named query from the command line
    # in a fresh process (owns its own Ray session)
    import subprocess
    import sys

    import pyarrow.parquet as pq
    out = str(tmp_path / "reg.parquet")
    p = subprocess.run(
        [sys.executable, "scripts/query_cli.py", "kg_tool_registry",
         "--sf", "/root/testdata/sf0.001", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "[kg_tool_registry]" in p.stdout
    assert pq.read_table(out).num_rows > 0
