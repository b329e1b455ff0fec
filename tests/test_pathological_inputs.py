"""Pathological inputs: duplicate turn ids, gaps, giant conversations —
extraction must stay deterministic and bounded (FIXTURES.md F5)."""

import pyarrow as pa

import ray.data

from joern_ray import schema as S
from joern_ray.stages import extract as X


def _mk(rows):
    cols = {f.name: [r.get(f.name) for r in rows] for f in S.TRANSCRIPTS}
    return pa.Table.from_pydict(cols, schema=S.TRANSCRIPTS)


def _rows(ds):
    t = pa.concat_tables([b for b in ds.iter_batches(batch_format="pyarrow")
                          if b.num_columns])
    return sorted(map(tuple, zip(*[c.to_pylist() for c in t.columns])))


def test_gaps_and_duplicate_turns_deterministic(ray_session):
    rows = [
        dict(conv_id="c1", turn_idx=0, role="user",
             text="Alice works at Acme Corp.", tool=None, ts=0),
        # gap: no turn 1-4
        dict(conv_id="c1", turn_idx=5, role="user",
             text="She uses search daily.", tool=None, ts=0),
        # duplicate turn_idx with a different sentence
        dict(conv_id="c1", turn_idx=5, role="assistant",
             text="Bob met with Carol.", tool=None, ts=0),
        dict(conv_id="c1", turn_idx=9, role="user",
             text="He uses browser daily.", tool=None, ts=0),
    ]
    ds = ray.data.from_arrow(_mk(rows)).repartition(3)
    a = _rows(X.extract_triples(ds))
    b = _rows(X.extract_triples(ds))
    assert a == b                      # deterministic under re-execution
    preds = [r[3] for r in a]
    assert "works_at" in preds and "met" in preds
    # pronoun at turn 5 resolves to Alice (strictly-earlier turn 0)
    resolved = [r for r in a if r[3] == "uses"]
    assert any(r[2] == "Alice" for r in resolved)


def test_giant_conversation_is_bounded_and_survives(ray_session):
    # one conversation bigger than the resolver cap would be too slow to
    # build here; instead lower the cap and verify truncation semantics:
    # only resolution input is capped, passthrough is unaffected
    rows = [dict(conv_id="big", turn_idx=0, role="user",
                 text="Alice works at Acme Corp.", tool=None, ts=0)]
    for i in range(1, 40):
        rows.append(dict(conv_id="big", turn_idx=i, role="user",
                         text="She uses search daily.", tool=None, ts=0))
    ds = ray.data.from_arrow(_mk(rows)).repartition(4)
    out = _rows(X.extract_triples(ds, max_resolve_events_per_conv=8))
    # works_at always extracted (passthrough); resolved pronouns only
    # for the pronoun rows that fit under the cap after the state rows —
    # since v38 an explicit works_at ships THREE narrow state rows
    # (person referent + v28 org-keyed descriptor state + v38 org
    # REFERENT state), so cap 8 = 3 state + 5 pronouns
    assert sum(1 for r in out if r[3] == "works_at") == 1
    n_resolved = sum(1 for r in out if r[3] == "uses")
    assert n_resolved == 5


def test_simhash_tokenless_batch(ray_session):
    """Whitespace-only / empty docs must not crash the vectorized kernel
    and must match the scalar contract."""
    import pyarrow as pa
    from joern_ray.pipelines import text as T

    t = pa.table({"doc_id": [1, 2], "text": ["", "   "]})
    out = T.simhash_batch(t)
    assert out.column("simhash").to_pylist() == [T.simhash64(""),
                                                T.simhash64("   ")]


def test_config_rejects_non_re2_patterns():
    import pytest
    from joern_ray.state import config as C

    bad = {"findings_rules": [{"rule": "x", "pattern": "(?<=foo)bar"}]}
    with pytest.raises(ValueError, match="RE2"):
        C.parse_semantics(bad)


def test_dirty_input_scan_rules_fire(ray_session):
    """The dirty-input scan rules (whitespace-only turns, duplicate text)
    never fire on the clean synth corpus — exercise them directly."""
    from joern_ray.pipelines.findings import scan

    rows = [
        dict(conv_id="d1", turn_idx=0, role="user", text="   \t\n "),
        dict(conv_id="d1", turn_idx=1, role="assistant",
             text="Same line repeated."),
        dict(conv_id="d1", turn_idx=2, role="user",
             text="Same line repeated."),
        dict(conv_id="d2", turn_idx=0, role="user", text=""),
    ]
    out = scan(ray.data.from_arrow(_mk(rows))).to_pandas()
    by_rule = out.groupby("rule").size().to_dict()
    assert by_rule.get("empty-turn") == 2          # both blank turns
    assert by_rule.get("duplicate-turn-text") == 1  # one (conv, text) pair


def test_lonely_entity_rule_fires(ray_session, tmp_path):
    """lonely-entity (mention count <= 1) never fires on the synth corpus
    where every entity recurs; plant a singleton mention directly."""
    import os

    import pyarrow.parquet as pq

    from joern_ray import synth
    from joern_ray.pipelines.findings import entity_rules

    sf = str(tmp_path / "lonelysf")
    d = synth.corpus_dir(sf)
    os.makedirs(d, exist_ok=True)
    rows = [
        dict(conv_id="c1", turn_idx=0, role="user",
             text="Alice works at Acme Corp."),
        dict(conv_id="c1", turn_idx=1, role="assistant",
             text="Bob works at Acme Corp."),
        dict(conv_id="c1", turn_idx=2, role="user",
             text="Bob uses search daily."),
    ]
    pq.write_table(_mk(rows), os.path.join(d, "transcripts.parquet"))
    pq.write_table(_mk([]), os.path.join(d, "gt_triples.parquet"))
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("ok")

    out = entity_rules(sf).to_pandas()
    lonely = set(out.loc[out["rule"] == "lonely-entity", "evidence"])
    assert "person:alice:1" in lonely
    assert "tool:search:1" in lonely
    assert "person:bob:2" not in lonely
