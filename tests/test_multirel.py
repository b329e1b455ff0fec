"""Multi-relation grammar constructs (coordination / appositive / relative
clause / quoted speech): explicit per-construct semantics, engine vs oracle
lockstep, and referent-state interaction.

Reference analog: nested-AST extraction — one statement, several relations
(``DependencyJsonGenerator.scala:83-140`` emits one JSON relation per
dependency edge of a statement).
"""

from __future__ import annotations

import pyarrow as pa

from joern_ray import schema as S
from joern_ray.extract import oracle as O
from joern_ray.stages import extract as X


def _turns(texts, conv="c1", role="user"):
    n = len(texts)
    return pa.table({
        "conv_id": [conv] * n,
        "turn_idx": pa.array(range(n), pa.int32()),
        "role": [role] * n,
        "text": texts,
        "tool": pa.nulls(n, pa.string()),
        "ts": pa.nulls(n, pa.timestamp("us")),
    }, schema=S.TRANSCRIPTS)


def _rows(t):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"],
         r["slot_idx"], r["clause"])
        for r in t.to_pylist() if r["subj"] is not None)


def test_coordination_two_triples_with_slots():
    ev = X.extract_events(_turns(["Alice and Bob work at Acme Corp."]))
    assert _rows(ev) == [
        ("c1", 0, "Alice", "works_at", "Acme Corp", 0, "main"),
        ("c1", 0, "Bob", "works_at", "Acme Corp", 1, "main"),
    ]


def test_appositive_emits_both_clauses():
    ev = X.extract_events(_turns(
        ["Carol, the maintainer of db.index, no longer works at Initech Labs."]))
    assert _rows(ev) == [
        ("c1", 0, "Carol", "maintains", "db.index", 0, "appositive"),
        ("c1", 0, "Carol", "works_at", "Initech Labs", 0, "main"),
    ]
    # sentence-level attrs apply to every emission
    assert all(r["negated"] for r in ev.to_pylist())


def test_relative_clause_emits_both():
    ev = X.extract_events(_turns(["Dave, who manages Erin, joined Hooli Inc."]))
    assert _rows(ev) == [
        ("c1", 0, "Dave", "joined", "Hooli Inc", 0, "main"),
        ("c1", 0, "Dave", "manages", "Erin", 0, "relative"),
    ]


def test_quoted_speech_inner_triple_only():
    ev = X.extract_events(_turns(['Frank said "Grace uses search daily."']))
    # the speaker is not an emitted slot — only the inner relation, marked
    assert _rows(ev) == [
        ("c1", 0, "Grace", "uses", "search", 0, "quoted"),
    ]


def test_quoted_inner_subject_feeds_referent_state():
    # Grace (inner subject, emitted slot) — not Frank — is the referent
    t = _turns(['Frank said "Grace uses search daily."',
                "She works at Globex Corp."])
    got = _rows(X._resolve_group(X.extract_events(t)))
    assert ("c1", 1, "Grace", "works_at", "Globex Corp", 0, "main") in got


def test_coordination_referent_is_lexicographic_max():
    t = _turns(["Bob and Zach work at Acme Corp.",
                "He uses compiler daily."])
    got = _rows(X._resolve_group(X.extract_events(t)))
    assert ("c1", 1, "Zach", "uses", "compiler", 0, "main") in got


def test_multirel_engine_oracle_lockstep():
    texts = [
        "Alice and Bob work at Acme Corp.",
        "Carol, the maintainer of fs.cache, works at Wonka Inc?",
        "Dave, who manages Erin, joined Stark Labs.",
        'Heidi said "Ivan uses browser daily."',
        "She works at Tyrell Corp.",
        "Judy and Karl use terminal daily.",
        "Thanks, that makes sense. Laura and Nina work at Oscorp Inc.",
    ]
    t = _turns(texts)
    eng = _rows(X._resolve_group(X.extract_events(t)))
    ora = sorted(
        (d["conv_id"], d["turn_idx"], d["subj"], d["pred"], d["obj"],
         d["slot_idx"], d["clause"])
        for d in O.extract_conversation(t.to_pylist()))
    assert eng == ora
    # multi-sentence turn: coordination matched after the filler sentence
    assert ("c1", 6, "Laura", "works_at", "Oscorp Inc", 0, "main") in eng


def test_coord3_three_triples_with_slots():
    ev = X.extract_events(_turns(["Alice, Bob and Carol work at Acme Corp."]))
    assert _rows(ev) == [
        ("c1", 0, "Alice", "works_at", "Acme Corp", 0, "main"),
        ("c1", 0, "Bob", "works_at", "Acme Corp", 1, "main"),
        ("c1", 0, "Carol", "works_at", "Acme Corp", 2, "main"),
    ]


def test_quoted_coordination_nested():
    ev = X.extract_events(_turns(['Dave said "Erin and Frank use search daily."']))
    assert _rows(ev) == [
        ("c1", 0, "Erin", "uses", "search", 0, "quoted"),
        ("c1", 0, "Frank", "uses", "search", 1, "quoted"),
    ]


def test_pronoun_in_coordination_resolves_with_slot():
    # pronoun in the FIRST coordinated slot: resolves to the committed
    # referent at slot 0; the partner (Grace) commits the new state
    t = _turns(["Bob works at Acme Corp.",
                "She and Grace work at Globex Inc.",
                "He uses search daily."])
    got = _rows(X._resolve_group(X.extract_events(t)))
    assert ("c1", 1, "Bob", "works_at", "Globex Inc", 0, "main") in got
    assert ("c1", 1, "Grace", "works_at", "Globex Inc", 1, "main") in got
    # turn-2 pronoun resolves to Grace (the partner committed at turn 1;
    # the resolved pronoun row itself contributed no state)
    assert ("c1", 2, "Grace", "uses", "search", 0, "main") in got


def test_pronoun_in_second_slot_keeps_slot_idx():
    t = _turns(["Zach uses compiler daily.",
                "Heidi and She use terminal daily."])
    got = _rows(X._resolve_group(X.extract_events(t)))
    # the resolved pronoun row carries the emission's slot_idx (1)
    assert ("c1", 1, "Zach", "uses", "terminal", 1, "main") in got
    assert ("c1", 1, "Heidi", "uses", "terminal", 0, "main") in got


def test_v8_engine_oracle_lockstep():
    texts = [
        "Alice, Bob and Carol work at Acme Corp.",
        'Dave said "Erin and Frank use search daily."',
        "She and Grace work at Globex Inc.",
        "Heidi and He use compiler daily.",
        "Thanks, that makes sense. Ivan, Judy and Karl work at Stark Labs?",
    ]
    t = _turns(texts)
    eng = _rows(X._resolve_group(X.extract_events(t)))
    ora = sorted(
        (d["conv_id"], d["turn_idx"], d["subj"], d["pred"], d["obj"],
         d["slot_idx"], d["clause"])
        for d in O.extract_conversation(t.to_pylist()))
    assert eng == ora


def test_object_pronoun_resolves_and_subject_commits():
    """v9: 'Alice met with her.' — the object pronoun resolves to the
    committed referent; Alice anchors the relation AND commits the new
    referent state for the following turns."""
    t = _turns(["Grace works at Acme Corp.",
                "Alice met with her.",
                "Bob manages him.",
                "She uses search daily."])
    got = _rows(X._resolve_group(X.extract_events(t)))
    assert ("c1", 1, "Alice", "met", "Grace", 0, "main") in got
    assert ("c1", 2, "Bob", "manages", "Alice", 0, "main") in got
    # 'She' at turn 3 resolves to Bob (turn-2 subject committed)
    assert ("c1", 3, "Bob", "uses", "search", 0, "main") in got


def test_object_pronoun_unresolvable_drops():
    t = _turns(["Alice met with her."])
    got = _rows(X._resolve_group(X.extract_events(t)))
    assert got == []


def test_pronoun_inside_quoted_speech_resolves_in_quoting_scope():
    """v11: 'X said "She uses y daily."' — the quoted pronoun resolves in
    the QUOTING turn's scope (committed referent of the latest earlier
    turn); the SPEAKER neither shadows the referent nor commits state
    (rules.py quoted-speech referent-scope contract)."""
    t = _turns(["Grace works at Acme Corp.",
                'Nina said "She uses search daily."',
                "He uses compiler daily."])
    got = _rows(X._resolve_group(X.extract_events(t)))
    # referent is Grace, NOT the speaker Nina; clause is 'quoted'
    assert ("c1", 1, "Grace", "uses", "search", 0, "quoted") in got
    # the quoted-pronoun turn committed no state: turn-2 pronoun still
    # resolves to Grace (turn 0 remains the latest person-bearing turn)
    assert ("c1", 2, "Grace", "uses", "compiler", 0, "main") in got


def test_pronoun_in_quoted_coordination_partner_commits():
    """v11 nested case: 'X said "She and Bob use y daily."' — pronoun slot
    resolves with slot_idx 0 in the quoted clause; the non-pronoun partner
    emits its own triple AND commits state for later turns."""
    t = _turns(["Grace works at Acme Corp.",
                'Nina said "She and Bob use search daily."',
                "She uses compiler daily."])
    got = _rows(X._resolve_group(X.extract_events(t)))
    assert ("c1", 1, "Grace", "uses", "search", 0, "quoted") in got
    assert ("c1", 1, "Bob", "uses", "search", 1, "quoted") in got
    # partner Bob committed: turn-2 'She' resolves to Bob
    assert ("c1", 2, "Bob", "uses", "compiler", 0, "main") in got


def test_quoted_pronoun_engine_oracle_lockstep():
    texts = [
        "Alice works at Acme Corp.",
        'Dave said "She uses search daily."',
        'Erin said "He and Frank use browser daily."',
        "She uses terminal daily.",
    ]
    t = _turns(texts)
    eng = _rows(X._resolve_group(X.extract_events(t)))
    ora = sorted(
        (d["conv_id"], d["turn_idx"], d["subj"], d["pred"], d["obj"],
         d["slot_idx"], d["clause"])
        for d in O.extract_conversation(t.to_pylist()))
    assert eng == ora
