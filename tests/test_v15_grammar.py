"""v15 construct semantics: OBJECT-side definite descriptions.

Pins the CONTRACT cases individually (object-slot resolution against the
committed maintainer state, explicit-subject state feed regardless of
resolvability, pronoun-subject skip, anchor disjointness from the plain
met/manages and subject-side descriptor templates, clause attribution) —
the corpus-wide four-implementation lockstep lives in test_extract.py /
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


def test_object_descriptor_resolves_to_committed_maintainer(ray_session):
    """'Bob met with the maintainer of <mod>.' — the OBJECT resolves to
    the committed maintainer of the latest strictly-earlier turn; clause
    is 'definite_obj'."""
    rows = _turns(["Alice maintains auth.core.",
                   "Bob met with the maintainer of auth.core."])
    got = _resolved(rows)
    assert (1, "Bob", "met", "Alice", 0, "definite_obj") in got
    assert got == _resolved_ray(rows, ray_session)


def test_object_descriptor_manages_variant(ray_session):
    rows = _turns(["Carol maintains db.index.",
                   "Frank manages the maintainer of db.index."])
    got = _resolved(rows)
    assert (1, "Frank", "manages", "Carol", 0, "definite_obj") in got
    assert got == _resolved_ray(rows, ray_session)


def test_object_descriptor_subject_feeds_state_even_unresolvable(
        ray_session):
    """The explicit subject commits referent state REGARDLESS of whether
    the descriptor resolves (object-pronoun discipline): the turn-1
    descriptor is unresolvable (no committed maintainer) yet turn-2's
    pronoun resolves to its subject."""
    rows = _turns(["Bob met with the maintainer of auth.core.",
                   "She uses compiler daily."])
    got = _resolved(rows)
    assert not any(c == "definite_obj" for *_, c in got)
    assert (1, "Bob", "uses", "compiler", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)


def test_object_descriptor_resolved_object_feeds_no_state(ray_session):
    """The RESOLVED object never feeds referent state: turn-3's pronoun
    resolves to the explicit subject (Zach > nothing else committed at
    turn 2), not to the resolved maintainer (Alice)."""
    rows = _turns(["Alice maintains auth.core.",
                   "Zach met with the maintainer of auth.core.",
                   "She uses terminal daily."])
    got = _resolved(rows)
    assert (1, "Zach", "met", "Alice", 0, "definite_obj") in got
    assert (2, "Zach", "uses", "terminal", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)


def test_object_descriptor_same_turn_commit_not_visible(ray_session):
    """Maintainer committed in the SAME turn is not visible (strictly-
    earlier-turn rule), mirroring the subject-side construct."""
    rows = _turns(["Alice maintains auth.core. "
                   "Bob met with the maintainer of auth.core."])
    got = _resolved(rows)
    assert not any(c == "definite_obj" for *_, c in got)
    assert got == _resolved_ray(rows, ray_session)


def test_object_descriptor_pronoun_subject_skips():
    """A pronoun subject emits NOTHING (no double resolution in v15)."""
    rows = _turns(["Alice maintains auth.core.",
                   "Bob uses search daily.",
                   "She met with the maintainer of auth.core."])
    got = _resolved(rows)
    assert not any(c == "definite_obj" for *_, c in got)
    ev = X.extract_events(_table(rows)).to_pylist()
    assert not any(r["clause"] == "definite_obj" for r in ev)


def test_object_descriptor_disjoint_from_plain_and_subject_side():
    """Anchor disjointness: the object-side sentence matches ONLY its own
    template (the plain 'met' object is capitalized; the subject-side
    descriptor starts with 'The maintainer of')."""
    rows = _turns(["Alice maintains auth.core.",
                   "Bob met with the maintainer of auth.core.",
                   "The maintainer of auth.core met with Carol.",
                   "Dave met with Heidi."])
    ev = X.extract_events(_table(rows)).to_pylist()
    met = sorted(((r["subj"] or "", r["obj"] or "", r["clause"],
                   r.get("desc_key") or "")
                  for r in ev if r["pred"] == "met"))
    assert met == [
        ("", "Carol", "definite", "auth.core"),          # subject-side
        ("Bob", "", "definite_obj", "auth.core"),        # object-side v15
        ("Dave", "Heidi", "main", ""),                   # plain
    ]


def test_object_descriptor_store_row_class(ray_session):
    """Event-store discriminator: subj NOT NULL + obj NULL + desc_key —
    distinct from object pronouns (no desc_key) — and the passthrough
    never leaks the unresolved row."""
    rows = _turns(["Alice maintains auth.core.",
                   "Bob met with the maintainer of auth.core.",
                   "Carol met with her."])
    ev = _tbl = X.extract_events(_table(rows))
    odesc = [r for r in ev.to_pylist()
             if r["subj"] is not None and r["obj"] is None
             and r.get("desc_key") is not None]
    assert len(odesc) == 1 and odesc[0]["subj"] == "Bob"
    opron = [r for r in ev.to_pylist()
             if r["subj"] is not None and r["obj"] is None
             and r.get("desc_key") is None]
    assert len(opron) == 1 and opron[0]["subj"] == "Carol"
    passthrough = X._passthrough_triples(_tbl).to_pylist()
    assert not any(r["subj"] == "Bob" and r["pred"] == "met"
                   for r in passthrough)
