"""v25 construct semantics: PRONOUN-IN-APPOSITIVE ("Bob, her manager,
joined Initech.") — the grammar's first lowercase mid-sentence pronoun.

Pins the CONTRACT cases individually: the appositive's pronoun riding the
object-pronoun class (manages(Bob, referent), clause 'appositive') next
to the main-clause joined emission, the explicit subject committing the
new referent, the pronoun-RESOLVED manages row feeding no
manager-descriptor state, the no-referent drop, the both-pronoun drop
(v21 rule) with the main clause degrading to a pronoun-subject emission,
and anchor disjointness from possessive_manager / manager descriptors /
the plain joined template.  The corpus-wide lockstep lives in
test_extract.py / test_synth_oracle.py / test_external_tool.py.
"""

import duckdb
import pyarrow as pa

from joern_ray import synth
from joern_ray.extract import oracle, sqlgen
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


def _resolved_sql(rows):
    con = duckdb.connect()
    con.register("transcripts_t", _table(rows))
    sql = sqlgen.resolved_triples_sql("transcripts_t")
    out = con.sql(f"SELECT turn_idx, subj, pred, obj, slot_idx, clause "
                  f"FROM ({sql})").fetchall()
    con.close()
    return set(out)


def test_appositive_pronoun_both_emissions(ray_session):
    """manages resolves to the committed referent with clause
    'appositive'; the main clause emits joined as usual."""
    rows = _turns(["Dave met with Erin.",
                   "Bob, her manager, joined Initech."])
    got = _resolved(rows)
    assert (1, "Bob", "manages", "Erin", 0, "appositive") in got
    assert (1, "Bob", "joined", "Initech", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_appositive_pronoun_his_variant(ray_session):
    rows = _turns(["Alice met with Frank.",
                   "Carol, his manager, joined Acme Corp."])
    got = _resolved(rows)
    assert (1, "Carol", "manages", "Frank", 0, "appositive") in got
    assert (1, "Carol", "joined", "Acme Corp", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_appositive_subject_commits_referent(ray_session):
    """The explicit subject (Bob) is the new committed referent — the
    object-pronoun discipline (the RESOLVED object never commits)."""
    rows = _turns(["Dave met with Erin.",
                   "Bob, her manager, joined Initech.",
                   "She works at Acme Corp."])
    got = _resolved(rows)
    assert (2, "Bob", "works_at", "Acme Corp", 0, "main") in got
    assert not any(t == 2 and s == "Erin" for (t, s, *_r) in got)
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_appositive_no_referent_drops_manages_only(ray_session):
    """With no strictly-earlier referent the manages emission drops
    (unresolvable pronoun ⇒ no triple) but the main clause still emits,
    and its subject still commits state."""
    rows = _turns(["Bob, her manager, joined Initech.",
                   "He uses vim daily."])
    got = _resolved(rows)
    assert not any(p == "manages" for (_t, _s, p, *_r) in got)
    assert (0, "Bob", "joined", "Initech", 0, "main") in got
    assert (1, "Bob", "uses", "vim", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_appositive_resolved_manages_feeds_no_descriptor_state(
        ray_session):
    """The pronoun-RESOLVED manages row never commits manager-descriptor
    state: a later 'The manager of Erin' descriptor stays unresolved."""
    rows = _turns(["Dave met with Erin.",
                   "Bob, her manager, joined Initech.",
                   "The manager of Erin met with Grace."])
    got = _resolved(rows)
    assert (1, "Bob", "manages", "Erin", 0, "appositive") in got
    assert not any(t == 2 for (t, *_r) in got)
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_appositive_both_pronoun_drops_to_pronoun_subject(ray_session):
    """'She, his manager, joined Acme.' — emission 1 drops (pronouns in
    BOTH slots, v21 rule); emission 2 degrades to a pronoun-subject
    event resolving joined(referent, org)."""
    rows = _turns(["Dave met with Erin.",
                   "She, his manager, joined Initech."])
    got = _resolved(rows)
    assert not any(p == "manages" for (_t, _s, p, *_r) in got)
    assert (1, "Erin", "joined", "Initech", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_appositive_disjoint_from_possessive_and_descriptor(ray_session):
    """The neighboring manager constructs keep their own templates: the
    possessive ("Bob's manager is Alice"), the manager descriptor family,
    and the plain joined template are unaffected by the new literal."""
    rows = _turns(["Bob's manager is Alice.",
                   "The manager of Bob met with Carol.",
                   "Frank joined Initech."])
    got = _resolved(rows)
    assert (0, "Alice", "manages", "Bob", 0, "possessive") in got
    assert (1, "Alice", "met", "Carol", 0, "definite") in got
    assert (2, "Frank", "joined", "Initech", 0, "main") in got
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_appositive_is_past_attribute():
    """'joined' is an intrinsically-past verb (PAST_RE): both emissions
    of the sentence carry is_past=true (sentence-level attribute)."""
    rows = _turns(["Dave met with Erin.",
                   "Bob, her manager, joined Initech."])
    ev = X.extract_events(_table(rows))
    at1 = {(d["pred"], d["is_past"]) for d in ev.to_pylist()
           if d["turn_idx"] == 1}
    assert ("manages", True) in at1 and ("joined", True) in at1
