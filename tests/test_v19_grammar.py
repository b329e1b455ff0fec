"""v19 construct semantics: VERB-PHRASE coordination and POSTPOSED
speech attribution.

Pins the CONTRACT cases individually (two relations off one subject,
clause='vp_coord'; descriptor-state feed from the vp maintains emission;
pronoun subject resolving ONCE for both conjuncts with no state feed;
quote-before-attribution with the quoted_uses contract — speaker not a
slot, pronoun resolves in quoting-turn scope; non-turn-final placement;
anchor disjointness from the plain maintains/uses templates) — the
corpus-wide four-implementation lockstep lives in test_extract.py /
test_synth_oracle.py / test_external_tool.py.
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


def test_vp_coord_two_relations_one_subject(ray_session):
    rows = _turns(["Alice maintains auth.core and uses vim daily."])
    got = _resolved(rows)
    assert (0, "Alice", "maintains", "auth.core", 0, "vp_coord") in got
    assert (0, "Alice", "uses", "vim", 0, "vp_coord") in got
    assert got == _resolved_ray(rows, ray_session)


def test_vp_coord_feeds_descriptor_state(ray_session):
    """The vp_coord maintains emission commits module-keyed descriptor
    state like any other explicit-subject maintains row."""
    rows = _turns(["Alice maintains auth.core and uses vim daily.",
                   "The maintainer of auth.core met with Bob."])
    got = _resolved(rows)
    assert (1, "Alice", "met", "Bob", 0, "definite") in got
    assert got == _resolved_ray(rows, ray_session)


def test_vp_coord_pronoun_subject_resolves_both_conjuncts(ray_session):
    """A pronoun subject resolves ONCE (standard Stage-B window) and both
    emissions carry the referent; the pronoun-RESOLVED maintains row must
    NOT feed descriptor state (turn-2 descriptor stays unresolvable)."""
    rows = _turns(["Carol uses compiler daily.",
                   "She maintains db.index and uses vim daily.",
                   "The maintainer of db.index met with Bob."])
    got = _resolved(rows)
    assert (1, "Carol", "maintains", "db.index", 0, "vp_coord") in got
    assert (1, "Carol", "uses", "vim", 0, "vp_coord") in got
    assert not any(c == "definite" for *_, c in got)
    assert got == _resolved_ray(rows, ray_session)


def test_vp_coord_anchor_disjointness(ray_session):
    """The plain templates still emit exactly clause='main' rows, and the
    vp sentence emits NO main-clause rows."""
    rows = _turns(["Alice maintains auth.core.",
                   "Bob uses vim daily.",
                   "Carol maintains db.index and uses compiler daily."])
    got = _resolved(rows)
    assert (0, "Alice", "maintains", "auth.core", 0, "main") in got
    assert (1, "Bob", "uses", "vim", 0, "main") in got
    main_t2 = [g for g in got if g[0] == 2 and g[5] == "main"]
    assert main_t2 == []
    assert len([g for g in got if g[0] == 2]) == 2
    assert got == _resolved_ray(rows, ray_session)


def test_postposed_attribution_basic(ray_session):
    rows = _turns(['"Bob uses vim daily," said Alice.'])
    got = _resolved(rows)
    assert got == {(0, "Bob", "uses", "vim", 0, "quoted")}
    assert got == _resolved_ray(rows, ray_session)


def test_postposed_speaker_contributes_no_state(ray_session):
    """Only the emitted inner subject (Bob) commits referent state; the
    postposed speaker (Zara, lexicographically larger) must not."""
    rows = _turns(['"Bob uses vim daily," said Zara.',
                   "She uses compiler daily."])
    got = _resolved(rows)
    assert (1, "Bob", "uses", "compiler", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)


def test_postposed_pronoun_resolves_in_quoting_scope(ray_session):
    """A pronoun inside the postposed quote resolves against the turns
    strictly before the QUOTING turn (the v11 referent-scope contract)."""
    rows = _turns(["Alice uses compiler daily.",
                   '"She uses vim daily," said Dan.'])
    got = _resolved(rows)
    assert (1, "Alice", "uses", "vim", 0, "quoted") in got
    assert got == _resolved_ray(rows, ray_session)


def test_postposed_non_final_placement(ray_session):
    """Unlike quoted_uses, the postposed sentence may be followed by more
    sentences in the same turn (its terminator is a plain '. ')."""
    rows = _turns(['"Bob uses vim daily," said Alice. '
                   "Carol maintains db.index."])
    got = _resolved(rows)
    assert (0, "Bob", "uses", "vim", 0, "quoted") in got
    assert (0, "Carol", "maintains", "db.index", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)
