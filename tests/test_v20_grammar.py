"""v20 construct semantics: DITRANSITIVE ("Alice introduced Bob to Carol.").

Pins the CONTRACT cases individually — two emissions of the SAME relation
discriminated by slot_idx (0 = direct object, 1 = recipient), per-row
referent-state feed (turn referent = max(direct object, recipient)),
pronoun-subject resolution shared across both emissions with NO state
commit (there is no partner subject slot), sentence-level attribute
propagation to both rows — the corpus-wide four-implementation lockstep
lives in test_extract.py / test_synth_oracle.py / test_external_tool.py.
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


def test_ditransitive_two_emissions(ray_session):
    """One sentence, two rows of the SAME relation: direct object at
    slot 0, recipient at slot 1, clause 'ditransitive' on both."""
    rows = _turns(["Alice introduced Bob to Carol."])
    got = _resolved(rows)
    assert (0, "Alice", "introduced", "Bob", 0, "ditransitive") in got
    assert (0, "Alice", "introduced", "Carol", 1, "ditransitive") in got
    assert got == _resolved_ray(rows, ray_session)


def test_ditransitive_referent_is_max_object(ray_session):
    """Both object persons feed referent state per-row; the committed
    referent is the turn max — max(Bob, Carol) = Carol."""
    rows = _turns(["Alice introduced Bob to Carol.",
                   "She works at Initech."])
    got = _resolved(rows)
    assert (1, "Carol", "works_at", "Initech", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)


def test_ditransitive_pronoun_subject_resolves_once(ray_session):
    """A pronoun subject resolves to the committed referent for BOTH
    emissions (they share the subj group); the resolved rows keep their
    own slot_idx."""
    rows = _turns(["Dave met with Erin.",
                   "She introduced Bob to Carol."])
    got = _resolved(rows)
    assert (1, "Erin", "introduced", "Bob", 0, "ditransitive") in got
    assert (1, "Erin", "introduced", "Carol", 1, "ditransitive") in got
    assert got == _resolved_ray(rows, ray_session)


def test_ditransitive_pronoun_rows_feed_no_state(ray_session):
    """Resolved pronoun rows contribute no referent state and the
    ditransitive has no partner SUBJECT slot, so the referent carries
    over UNCHANGED past the pronoun turn (still Erin, not Carol)."""
    rows = _turns(["Dave met with Erin.",
                   "She introduced Bob to Carol.",
                   "She uses vim daily."])
    got = _resolved(rows)
    assert (2, "Erin", "uses", "vim", 0, "main") in got
    assert not any(s == "Carol" and t == 2 for (t, s, *_rest) in got)
    assert got == _resolved_ray(rows, ray_session)


def test_ditransitive_explicit_subject_does_not_commit(ray_session):
    """The SUBJECT of an explicit ditransitive is shadowed by its person
    objects (per-row obj-shadows-subj): after 'Zed introduced Al to Bo.'
    the referent is Bo (max object), never Zed."""
    rows = _turns(["Zed introduced Al to Bo.",
                   "He works at Initech."])
    got = _resolved(rows)
    assert (1, "Bo", "works_at", "Initech", 0, "main") in got


def test_ditransitive_question_attribute_on_both_rows():
    """'?' terminator marks BOTH emissions in_question (attributes are
    sentence-level)."""
    rows = _turns(["Alice introduced Bob to Carol?"])
    out = [d for d in oracle.extract_conversation(rows)
           if d["pred"] == "introduced"]
    assert len(out) == 2
    assert all(d["in_question"] for d in out)
    assert all(not d["negated"] for d in out)


def test_ditransitive_mid_turn_sentence(ray_session):
    """The construct composes with the sentence splitter — a following
    sentence in the same turn still extracts."""
    rows = _turns(["Alice introduced Bob to Carol. Dana maintains auth.core."])
    got = _resolved(rows)
    assert (0, "Alice", "introduced", "Bob", 0, "ditransitive") in got
    assert (0, "Dana", "maintains", "auth.core", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)
