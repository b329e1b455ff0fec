"""v12 construct semantics: open-ended coordination lists (4+ members) and
cross-sentence definite-description anaphora.

Checks the Arrow kernel (stages.extract) and the Python oracle
(extract.oracle) against hand-written expectations on crafted
conversations — the corpus-wide lockstep lives in test_extract.py /
test_synth_oracle.py; these pin the CONTRACT cases (slot indices,
disjointness-by-anchor, latest-strictly-earlier-turn resolution, state
feeding) individually so a regression names the broken rule.
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


def _ev(table):
    return [(r["subj"], r["pred"], r["obj"], r["slot_idx"], r["clause"])
            for r in table.to_pylist()
            if r["obj_kind"] != "unknown"]   # drop kind-recovery overlay


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
# open-ended coordination lists
# ---------------------------------------------------------------------------

def test_list_four_and_five_members_slot_indices():
    rows = _turns(["Alice, Bob, Carol and Dave work at Initech.",
                   "Erin, Frank, Grace, Heidi and Ivan work at Acme Corp."])
    ev = _ev(X.extract_events(_table(rows)))
    four = [(s, sl) for s, p, o, sl, c in ev if o == "Initech"]
    five = [(s, sl) for s, p, o, sl, c in ev if o == "Acme Corp"]
    assert sorted(four) == [("Alice", 0), ("Bob", 1), ("Carol", 2),
                            ("Dave", 3)]
    assert sorted(five) == [("Erin", 0), ("Frank", 1), ("Grace", 2),
                            ("Heidi", 3), ("Ivan", 4)]
    assert all(p == "works_at" and c == "main" for s, p, o, sl, c in ev)


def test_list_disjoint_from_two_and_three_way_coordination():
    """Anchor disjointness: 2-way and 3-way sentences route to their own
    templates (and only them) — member multiplicity never double-emits."""
    rows = _turns(["Alice and Bob work at Initech.",
                   "Carol, Dave and Erin work at Globex.",
                   "Frank, Grace, Heidi and Ivan work at Acme Corp."])
    ev = _ev(X.extract_events(_table(rows)))
    by_obj = {}
    for s, p, o, sl, c in ev:
        by_obj.setdefault(o, []).append((s, sl))
    assert sorted(by_obj["Initech"]) == [("Alice", 0), ("Bob", 1)]
    assert sorted(by_obj["Globex"]) == [("Carol", 0), ("Dave", 1),
                                        ("Erin", 2)]
    assert sorted(by_obj["Acme Corp"]) == [("Frank", 0), ("Grace", 1),
                                           ("Heidi", 2), ("Ivan", 3)]
    assert len(ev) == 9


def test_list_pronoun_member_resolves_with_slot(ray_session):
    """A pronoun member of a 4-way list emits a PRONOUN event carrying its
    slot and resolves against the committed earlier-turn referent; its
    non-pronoun partners emit normally and feed state."""
    rows = _turns(["Judy uses compiler daily.",
                   "Alice, Bob, She and Dave work at Initech."])
    want_row = (1, "Judy", "works_at", "Initech", 2, "main")
    got_py = _resolved(rows)
    assert want_row in got_py
    explicit = {(1, s, "works_at", "Initech", i, "main")
                for s, i in [("Alice", 0), ("Bob", 1), ("Dave", 3)]}
    assert explicit <= got_py
    assert got_py == _resolved_ray(rows, ray_session)


def test_list_unresolvable_pronoun_member_drops(ray_session):
    rows = _turns(["Alice, Bob, She and Dave work at Initech."])
    got = _resolved(rows)
    assert not any(sl == 2 for _t, _s, _p, _o, sl, _c in got)
    assert len([r for r in got if r[2] == "works_at"]) == 3
    assert got == _resolved_ray(rows, ray_session)


# ---------------------------------------------------------------------------
# definite-description anaphora
# ---------------------------------------------------------------------------

def test_definite_resolves_latest_strictly_earlier_commit(ray_session):
    rows = _turns(["Alice maintains auth.core.",
                   "The maintainer of auth.core met with Bob.",
                   "Carol maintains auth.core.",
                   "The maintainer of auth.core met with Dave."])
    got = _resolved(rows)
    assert (1, "Alice", "met", "Bob", 0, "definite") in got
    assert (3, "Carol", "met", "Dave", 0, "definite") in got
    assert got == _resolved_ray(rows, ray_session)


def test_definite_same_turn_commit_not_visible():
    """State commits at turn boundaries: a maintains in the SAME turn as
    the descriptor must not resolve it (strictly-earlier contract)."""
    rows = _turns(["Alice maintains auth.core. "
                   "The maintainer of auth.core met with Bob."])
    got = _resolved(rows)
    assert not any(c == "definite" for *_, c in got)
    # but an earlier-turn commit wins over the same-turn one
    rows2 = _turns(["Erin maintains auth.core.",
                    "Alice maintains auth.core. "
                    "The maintainer of auth.core met with Bob."])
    got2 = _resolved(rows2)
    assert (1, "Erin", "met", "Bob", 0, "definite") in got2


def test_definite_key_isolation_and_unresolvable_drop(ray_session):
    """Module keys are independent; a descriptor with no committed state
    for ITS key emits nothing even when other keys have state."""
    rows = _turns(["Alice maintains auth.core.",
                   "The maintainer of db.index met with Bob."])
    got = _resolved(rows)
    assert not any(c == "definite" for *_, c in got)
    assert got == _resolved_ray(rows, ray_session)


def test_definite_tiebreak_max_person_within_turn():
    rows = _turns(["Alice maintains auth.core. Zach maintains auth.core.",
                   "The maintainer of auth.core met with Bob."])
    got = _resolved(rows)
    assert (1, "Zach", "met", "Bob", 0, "definite") in got
    assert (1, "Alice", "met", "Bob", 0, "definite") not in got


def test_definite_pronoun_resolved_maintains_never_feeds_state():
    """Resolution is a pure function of the committed EXPLICIT stream: a
    pronoun-resolved maintains row must not commit (module -> person)."""
    rows = _turns(["Zach uses compiler daily.",
                   "Alice maintains auth.core.",
                   "She maintains auth.core.",   # resolves to Zach... no:
                   # referent = Zach (turn-0 commit); this resolved row
                   # must NOT feed maintainer state
                   "The maintainer of auth.core met with Bob."])
    got = _resolved(rows)
    # descriptor sees the EXPLICIT commit (Alice), not the resolved Zach row
    assert (3, "Alice", "met", "Bob", 0, "definite") in got
    assert (3, "Zach", "met", "Bob", 0, "definite") not in got


def test_definite_object_feeds_pronoun_state(ray_session):
    """The resolved row's EXPLICIT person object anchors pronoun-referent
    state (the object-pronoun discipline)."""
    rows = _turns(["Alice maintains auth.core.",
                   "The maintainer of auth.core met with Bob.",
                   "She uses compiler daily."])
    got = _resolved(rows)
    assert (2, "Bob", "uses", "compiler", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)


def test_definite_org_object_resolves_and_feeds_no_state(ray_session):
    """v13 descriptor: 'The maintainer of <mod> joined <Org>.' — the
    resolved subject is the committed maintainer; the explicit ORG object
    must NOT feed pronoun-referent state (kind-conditional feed rule)."""
    rows = _turns(["Bob uses compiler daily.",
                   "Alice maintains auth.core.",
                   "The maintainer of auth.core joined Globex Corp.",
                   "She uses editor daily."])
    got = _resolved(rows)
    assert (2, "Alice", "joined", "Globex Corp", 0, "definite") in got
    # turn-3 pronoun referent: turn-2's only person contribution would be
    # the org (excluded); Alice's turn-1 maintains commit wins
    assert (3, "Alice", "uses", "editor", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)


def test_definite_org_descriptor_disjoint_from_plain_joined():
    rows = _turns(["Dave joined Initech.",
                   "Alice maintains auth.core.",
                   "The maintainer of auth.core joined Initech."])
    ev = _ev(X.extract_events(_table(rows)))
    plain = [(s, c) for s, p, o, sl, c in ev if p == "joined"]
    assert ("Dave", "main") in plain
    # the descriptor sentence emits exactly one event, the definite one
    assert sorted(c for s, c in plain) == ["definite", "main"]


def test_definite_events_carry_desc_key_discriminator():
    rows = _turns(["The maintainer of auth.core met with Bob."])
    ev = X.extract_events(_table(rows)).to_pylist()
    desc = [r for r in ev if r.get("desc_key") is not None]
    assert len(desc) == 1
    assert desc[0]["subj"] is None and desc[0]["desc_key"] == "auth.core"
    assert desc[0]["pred"] == "met" and desc[0]["obj"] == "Bob"
    assert desc[0]["clause"] == "definite"
    # every non-definite row has a NULL desc_key
    assert all(r["desc_key"] is None for r in ev
               if r["clause"] != "definite")
