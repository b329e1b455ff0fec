"""v14 construct semantics: definite descriptions nested in quoted speech
and tool-object descriptors.

Pins the CONTRACT cases individually (referent scope of the quoting turn,
speaker non-commitment, kind-conditional state feed, clause attribution,
anchor disjointness) — the corpus-wide four-implementation lockstep lives
in test_extract.py / test_synth_oracle.py / test_external_tool.py.
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


# ---------------------------------------------------------------------------
# quoted-nested definite descriptions
# ---------------------------------------------------------------------------

def test_quoted_definite_resolves_in_quoting_turn_scope(ray_session):
    """The descriptor inside the quote resolves against the committed
    maintainer of the latest strictly-earlier turn — the v11 quoted-pronoun
    scope convention — and carries the distinct 'quoted_definite' clause."""
    rows = _turns(["Alice maintains auth.core.",
                   'Erin said "The maintainer of auth.core met with Bob."'])
    got = _resolved(rows)
    assert (1, "Alice", "met", "Bob", 0, "quoted_definite") in got
    assert got == _resolved_ray(rows, ray_session)


def test_quoted_definite_speaker_not_committed(ray_session):
    """The speaker is not an emitted slot: it neither shadows the referent
    nor feeds pronoun state.  The explicit person object inside the quote
    DOES commit (turn-2 pronoun resolves to Bob, not Erin)."""
    rows = _turns(["Alice maintains auth.core.",
                   'Erin said "The maintainer of auth.core met with Bob."',
                   "She uses compiler daily."])
    got = _resolved(rows)
    assert (2, "Bob", "uses", "compiler", 0, "main") in got
    assert not any(s == "Erin" for _t, s, *_ in got)
    assert got == _resolved_ray(rows, ray_session)


def test_quoted_definite_unresolvable_drops():
    """No committed maintainer for the key => the nested descriptor emits
    nothing (same drop rule as the plain construct)."""
    rows = _turns(['Erin said "The maintainer of auth.core met with Bob."'])
    got = _resolved(rows)
    assert not any(c == "quoted_definite" for *_, c in got)


def test_quoted_definite_same_turn_commit_not_visible():
    rows = _turns(["Alice maintains auth.core. "
                   'Erin said "The maintainer of auth.core met with Bob."'])
    got = _resolved(rows)
    assert not any(c == "quoted_definite" for *_, c in got)


def test_quoted_definite_disjoint_from_plain_and_quoted_uses():
    """Anchor disjointness: the nested sentence matches ONLY the
    quoted-definite template; plain descriptors and quoted_uses keep their
    own clauses."""
    rows = _turns(["Alice maintains auth.core.",
                   "The maintainer of auth.core met with Bob.",
                   'Erin said "The maintainer of auth.core met with Carol."',
                   'Erin said "Dave uses search daily."'])
    ev = X.extract_events(_table(rows)).to_pylist()
    met = [(r["obj"], r["clause"]) for r in ev if r["pred"] == "met"]
    assert sorted(met) == [("Bob", "definite"), ("Carol", "quoted_definite")]
    uses = [(r["subj"], r["clause"]) for r in ev if r["pred"] == "uses"]
    assert uses == [("Dave", "quoted")]
    # nested rows carry the desc_key discriminator like plain ones
    nested = [r for r in ev if r["clause"] == "quoted_definite"]
    assert nested[0]["desc_key"] == "auth.core" and nested[0]["subj"] is None


# ---------------------------------------------------------------------------
# tool-object descriptors
# ---------------------------------------------------------------------------

def test_tool_descriptor_resolves_and_feeds_no_state(ray_session):
    """'The maintainer of <mod> uses <tool> daily.' — resolved subject is
    the committed maintainer; the explicit TOOL object must NOT feed
    pronoun-referent state (kind-conditional feed rule)."""
    rows = _turns(["Bob uses compiler daily.",
                   "Alice maintains auth.core.",
                   "The maintainer of auth.core uses editor daily.",
                   "She uses terminal daily."])
    got = _resolved(rows)
    assert (2, "Alice", "uses", "editor", 0, "definite") in got
    # turn-3 referent: turn-2 committed nothing (tool object) — Alice's
    # turn-1 maintains commit wins
    assert (3, "Alice", "uses", "terminal", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)


def test_tool_descriptor_disjoint_from_plain_uses():
    """The plain 'uses' template (subject admits no space) cannot match the
    descriptor sentence and vice versa."""
    rows = _turns(["Dave uses search daily.",
                   "Alice maintains auth.core.",
                   "The maintainer of auth.core uses search daily."])
    ev = X.extract_events(_table(rows)).to_pylist()
    uses = [(r["subj"], r["clause"], r.get("desc_key")) for r in ev
            if r["pred"] == "uses"]
    assert sorted(uses, key=lambda x: (x[0] or "", x[1])) == [
        (None, "definite", "auth.core"), ("Dave", "main", None)]


def test_tool_descriptor_unresolvable_drops(ray_session):
    rows = _turns(["Alice maintains db.index.",
                   "The maintainer of auth.core uses editor daily."])
    got = _resolved(rows)
    assert not any(c == "definite" for *_, c in got)
    assert got == _resolved_ray(rows, ray_session)
