"""v16 construct semantics: manager-family descriptors (generic
descriptor-state families).

Pins the CONTRACT cases: person-keyed state from explicit 'manages'
events, the dual state feed of a manages event (OBJECT to person state,
SUBJECT to manager state), non-feeding of pronoun-resolved rows, family
key-space disjointness, and multi-template (relative/possessive) state
commits.  Corpus-wide four-implementation lockstep lives in
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
    t, _ = synth.generate_corpus(1)
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


def test_manager_descriptor_resolves_subject_side(ray_session):
    rows = _turns(["Alice manages Bob.",
                   "The manager of Bob met with Carol."])
    got = _resolved(rows)
    assert (1, "Alice", "met", "Carol", 0, "definite") in got
    assert got == _resolved_ray(rows, ray_session)


def test_manager_descriptor_object_side(ray_session):
    rows = _turns(["Alice manages Bob.",
                   "Carol met with the manager of Bob."])
    got = _resolved(rows)
    assert (1, "Carol", "met", "Alice", 0, "definite_obj") in got
    assert got == _resolved_ray(rows, ray_session)


def test_manages_event_feeds_both_states_with_different_slots(ray_session):
    """'Alice manages Bob.' — the OBJECT (Bob) is the turn's
    pronoun-referent (obj shadows subj) while the SUBJECT (Alice) is the
    committed manager of Bob: the same event feeds each state from a
    DIFFERENT slot."""
    rows = _turns(["Alice manages Bob.",
                   "She uses compiler daily.",
                   "The manager of Bob joined Acme Corp."])
    got = _resolved(rows)
    assert (1, "Bob", "uses", "compiler", 0, "main") in got     # obj wins
    assert (2, "Alice", "joined", "Acme Corp", 0, "definite") in got
    assert got == _resolved_ray(rows, ray_session)


def test_pronoun_resolved_manages_feeds_no_manager_state(ray_session):
    """'Dave manages her.' resolves its object from the committed referent
    but must NOT commit manager state for the referent (resolution is a
    pure function of the committed stream)."""
    rows = _turns(["Bob uses search daily.",
                   "Dave manages her.",      # resolves: Dave manages Bob
                   "The manager of Bob met with Carol."])
    got = _resolved(rows)
    assert not any(c == "definite" for *_, c in got)
    assert got == _resolved_ray(rows, ray_session)


def test_manager_state_same_turn_commit_not_visible(ray_session):
    rows = _turns(["Alice manages Bob. "
                   "The manager of Bob met with Carol."])
    got = _resolved(rows)
    assert not any(c == "definite" for *_, c in got)
    assert got == _resolved_ray(rows, ray_session)


def test_family_key_spaces_are_disjoint(ray_session):
    """A manages commit never satisfies a maintainer descriptor and vice
    versa — module keys and person keys cannot collide by shape."""
    rows = _turns(["Alice manages Bob.",
                   "Erin maintains auth.core.",
                   "The maintainer of auth.core met with Carol.",
                   "The manager of Bob met with Dave."])
    got = _resolved(rows)
    assert (2, "Erin", "met", "Carol", 0, "definite") in got
    assert (3, "Alice", "met", "Dave", 0, "definite") in got
    assert got == _resolved_ray(rows, ray_session)


def test_relative_and_possessive_manages_commit_manager_state(ray_session):
    """Multi-template manages emissions (relative clause, possessive) are
    explicit events and feed the manager state like the plain template."""
    rows = _turns(["Alice, who manages Bob, joined Acme Corp.",
                   "The manager of Bob met with Carol.",
                   "Dave's manager is Erin.",
                   "The manager of Dave met with Frank."])
    got = _resolved(rows)
    assert (1, "Alice", "met", "Carol", 0, "definite") in got
    assert (3, "Erin", "met", "Frank", 0, "definite") in got
    assert got == _resolved_ray(rows, ray_session)


def test_manager_descriptor_turn_max_tiebreak(ray_session):
    """Two managers committed for the same key in one turn: the
    lexicographically greatest wins (the shared per-turn max rule)."""
    rows = _turns(["Alice manages Bob. Zach manages Bob.",
                   "The manager of Bob met with Carol."])
    got = _resolved(rows)
    assert (1, "Zach", "met", "Carol", 0, "definite") in got
    assert got == _resolved_ray(rows, ray_session)


def test_quoted_manager_descriptor_quoting_turn_scope(ray_session):
    """(v17) 'Erin said "The manager of Bob met with Carol."' resolves in
    the quoting turn's scope with clause 'quoted_definite'; the speaker
    is not an emitted slot."""
    rows = _turns(["Alice manages Bob.",
                   'Erin said "The manager of Bob met with Carol."',
                   "She uses compiler daily."])
    got = _resolved(rows)
    assert (1, "Alice", "met", "Carol", 0, "quoted_definite") in got
    # Carol (explicit person object in the quote) commits; Erin never does
    assert (2, "Carol", "uses", "compiler", 0, "main") in got
    assert not any(s == "Erin" for _t, s, *_ in got)
    assert got == _resolved_ray(rows, ray_session)


def test_quoted_manager_descriptor_unresolvable_drops():
    rows = _turns(['Erin said "The manager of Bob met with Carol."'])
    assert not any(c == "quoted_definite" for *_, c in _resolved(rows))


def test_quoted_object_pronoun_quoting_turn_scope(ray_session):
    """(v18) 'Erin said "Bob met with her."' — the object pronoun
    resolves in the quoting turn's scope; the inner subject anchors and
    commits; the speaker never does; clause is 'quoted'."""
    rows = _turns(["Alice uses search daily.",
                   'Erin said "Bob met with her."',
                   "She uses compiler daily."])
    got = _resolved(rows)
    assert (1, "Bob", "met", "Alice", 0, "quoted") in got
    # Bob (inner subject) committed; Erin (speaker) never does
    assert (2, "Bob", "uses", "compiler", 0, "main") in got
    assert not any(s == "Erin" for _t, s, *_ in got)
    assert got == _resolved_ray(rows, ray_session)


def test_quoted_object_pronoun_unresolvable_drops(ray_session):
    rows = _turns(['Erin said "Bob manages him."'])
    got = _resolved(rows)
    assert not any(p == "manages" for _t, _s, p, *_ in got)
    assert got == _resolved_ray(rows, ray_session)
