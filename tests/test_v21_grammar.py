"""v21 construct semantics: RECIPROCAL coordination ("Alice and Bob met.")
and the object-pronoun rule for multi-relation templates.

Pins the CONTRACT cases individually — symmetric double emission with
slot_idx = the row subject's coordination position, per-row state feed
(turn referent = max member), the pronoun-member split (pronoun-SUBJECT
event one way, OBJECT-pronoun event the other, both resolving to the same
committed referent, only the explicit partner feeding state), and the
both-pronoun drop — the corpus-wide four-implementation lockstep lives in
test_extract.py / test_synth_oracle.py / test_external_tool.py.
"""

import pyarrow as pa

from joern_ray import synth
from joern_ray.extract import oracle
from joern_ray.stages import extract as X


def _turns(texts, conv="convA"):
    return [dict(conv_id=conv, turn_idx=i, role="user", text=t,
                 tool=None, ts=None) for i, t in enumerate(texts)]


def _table(rows):
    t, _ = synth.generate_corpus(1)  # borrow the authoritative schema
    cols = {name: [r.get(name) for r in rows] for name in t.schema.names}
    return pa.Table.from_pydict(cols, schema=t.schema)


def _resolved(rows):
    return {(d["turn_idx"], d["subj"], d["pred"], d["obj"], d["slot_idx"],
             d["clause"]) for d in oracle.extract_conversation(rows)}


def _resolved_ray(rows, ray_session):
    import ray
    out = X.extract_triples(ray.data.from_arrow(_table(rows)))
    return {(d["turn_idx"], d["subj"], d["pred"], d["obj"], d["slot_idx"],
             d["clause"])
            for b in out.iter_batches(batch_format="pyarrow")
            for d in b.to_pylist()}


def test_reciprocal_double_emission(ray_session):
    """One sentence, the relation in BOTH directions; slot_idx is the
    row subject's coordination position."""
    rows = _turns(["Alice and Bob met."])
    got = _resolved(rows)
    assert (0, "Alice", "met", "Bob", 0, "reciprocal") in got
    assert (0, "Bob", "met", "Alice", 1, "reciprocal") in got
    assert got == _resolved_ray(rows, ray_session)


def test_reciprocal_referent_is_max_member(ray_session):
    rows = _turns(["Alice and Bob met.",
                   "She works at Initech."])
    got = _resolved(rows)
    assert (1, "Bob", "works_at", "Initech", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)


def test_reciprocal_pronoun_member_splits(ray_session):
    """'She and Bob met.' — a pronoun-SUBJECT emission met(ref, Bob) and
    an OBJECT-pronoun emission met(Bob, ref); both resolve to the same
    committed referent with their own slot positions."""
    rows = _turns(["Dave met with Erin.",
                   "She and Bob met."])
    got = _resolved(rows)
    assert (1, "Erin", "met", "Bob", 0, "reciprocal") in got
    assert (1, "Bob", "met", "Erin", 1, "reciprocal") in got
    assert got == _resolved_ray(rows, ray_session)


def test_reciprocal_pronoun_member_state_is_partner(ray_session):
    """Only the explicit partner feeds state after a pronoun-member
    reciprocal (the object-pronoun row's subject) — the referent moves
    to Bob even though Erin sorts later."""
    rows = _turns(["Dave met with Erin.",
                   "She and Bob met.",
                   "He uses vim daily."])
    got = _resolved(rows)
    assert (2, "Bob", "uses", "vim", 0, "main") in got
    assert not any(s == "Erin" and t == 2 for (t, s, *_rest) in got)
    assert got == _resolved_ray(rows, ray_session)


def test_reciprocal_pronoun_second_position(ray_session):
    """'Bob and She met.' — same split with the pronoun in the second
    coordination slot."""
    rows = _turns(["Dave met with Erin.",
                   "Bob and She met."])
    got = _resolved(rows)
    assert (1, "Bob", "met", "Erin", 0, "reciprocal") in got
    assert (1, "Erin", "met", "Bob", 1, "reciprocal") in got
    assert got == _resolved_ray(rows, ray_session)


def test_reciprocal_both_pronouns_drop(ray_session):
    """'She and He met.' — both-pronoun emissions drop entirely (v21
    rule); no 'met' row survives from the turn."""
    rows = _turns(["Dave met with Erin.",
                   "She and He met."])
    got = _resolved(rows)
    assert not any(p == "met" and t == 1 for (t, _s, p, *_r) in got)
    assert got == _resolved_ray(rows, ray_session)


def test_reciprocal_no_referent_drops_pronoun_rows(ray_session):
    """A pronoun-member reciprocal with NO committed referent emits
    neither direction's pronoun row (but a later explicit reciprocal
    still works)."""
    rows = _turns(["She and Bob met.",
                   "Alice and Carol met."])
    got = _resolved(rows)
    assert not any(t == 0 for (t, *_r) in got)
    assert (1, "Alice", "met", "Carol", 0, "reciprocal") in got
    assert (1, "Carol", "met", "Alice", 1, "reciprocal") in got
    assert got == _resolved_ray(rows, ray_session)


def test_reciprocal_disjoint_from_met_with(ray_session):
    """'met with' stays a single-direction template; the reciprocal
    anchor (' met.') never matches it and vice versa."""
    rows = _turns(["Alice met with Bob."])
    got = _resolved(rows)
    assert (0, "Alice", "met", "Bob", 0, "main") in got
    assert len([1 for (_t, _s, p, *_r) in got if p == "met"]) == 1
    assert got == _resolved_ray(rows, ray_session)
