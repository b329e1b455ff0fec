"""v22 construct semantics: DITRANSITIVE nested in QUOTED speech —
the v20 double emission under the quoting contract (speaker not an
emitted slot, clause 'quoted', quoting-turn pronoun scope)."""

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


def test_quoted_ditransitive_emissions(ray_session):
    rows = _turns(['Zoe said "Alice introduced Bob to Carol."'])
    got = _resolved(rows)
    assert (0, "Alice", "introduced", "Bob", 0, "quoted") in got
    assert (0, "Alice", "introduced", "Carol", 1, "quoted") in got
    assert got == _resolved_ray(rows, ray_session)


def test_quoted_ditransitive_speaker_feeds_no_state(ray_session):
    """The speaker (Zoe, lexicographic max in the turn) never commits;
    the referent is max(Bob, Carol) = Carol."""
    rows = _turns(['Zoe said "Alice introduced Bob to Carol."',
                   "She works at Initech."])
    got = _resolved(rows)
    assert (1, "Carol", "works_at", "Initech", 0, "main") in got
    assert not any(s == "Zoe" for (_t, s, *_r) in got)
    assert got == _resolved_ray(rows, ray_session)


def test_quoted_ditransitive_pronoun_subject_quoting_scope(ray_session):
    """A pronoun subject INSIDE the quote resolves in the QUOTING turn's
    scope (v11 contract) — the committed referent of turn 0."""
    rows = _turns(["Dave met with Erin.",
                   'Zoe said "She introduced Bob to Carol."'])
    got = _resolved(rows)
    assert (1, "Erin", "introduced", "Bob", 0, "quoted") in got
    assert (1, "Erin", "introduced", "Carol", 1, "quoted") in got
    assert got == _resolved_ray(rows, ray_session)


def test_plain_ditransitive_not_shadowed(ray_session):
    """The quoted template never claims the plain construct (anchor
    disjointness) and vice versa."""
    rows = _turns(["Alice introduced Bob to Carol."])
    got = _resolved(rows)
    assert (0, "Alice", "introduced", "Bob", 0, "ditransitive") in got
    assert not any(c == "quoted" for (*_r, c) in got)
