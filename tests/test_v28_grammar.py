"""v28 construct semantics: ORG-keyed cross-sentence appositive
descriptors ("The Acme engineer met with Bob.").

Contract (rules.py): the third descriptor-state family — every explicit
works_at(person, org) event commits (normalize_surface('org', obj) ->
person) state at its turn (per-turn lexicographic max, strictly-earlier
commit), and "The <Base> engineer ..." resolves lower(<Base>) against
it.  Typo'd org surfaces commit under THEIR normalized key (the
surface-keyed story: "Acmee Labs" -> 'acmee' != 'acme'); fuzzy
unification stays canonicalization's job.  Key spaces remain disjoint
by shape (org keys lowercase undotted, module keys dotted, manager keys
Capitalized).  Clause = 'definite_org'; the explicit person object
feeds referent state; resolved rows feed none; pronoun-resolved
works_at rows never commit.

Reference precedent: scope-crossing linking by normalized name
(``x2cpg/passes/frontend/XImportResolverPass.scala:1-46``); the fuzzy
closure is a separate pass (``DynamicCallLinker.scala:82-126``).
"""

import duckdb
import pyarrow as pa

from joern_ray import synth
from joern_ray.extract import oracle, sqlgen
from joern_ray.functions import rules as R
from joern_ray.stages import extract as X


def _turns(texts, conv="convA"):
    return [dict(conv_id=conv, turn_idx=i, role="user", text=t,
                 tool=None, ts=None) for i, t in enumerate(texts)]


def _table(rows):
    t, _ = synth.generate_corpus(1)
    cols = {name: [r.get(name) for r in rows] for name in t.schema.names}
    return pa.Table.from_pydict(cols, schema=t.schema)


_KEY = ("turn_idx", "subj", "pred", "obj", "clause")


def _resolved(rows):
    return {tuple(d[k] for k in _KEY)
            for d in oracle.extract_conversation(rows)}


def _resolved_ray(rows):
    import ray
    out = X.extract_triples(ray.data.from_arrow(_table(rows)))
    return {tuple(d[k] for k in _KEY)
            for b in out.iter_batches(batch_format="pyarrow")
            for d in b.to_pylist()}


def _resolved_sql(rows):
    con = duckdb.connect()
    con.register("transcripts_t", _table(rows))
    sql = sqlgen.resolved_triples_sql("transcripts_t")
    out = con.sql("SELECT turn_idx, subj, pred, obj, clause "
                  f"FROM ({sql})").fetchall()
    con.close()
    return set(out)


SCENARIO = ["Alice works at Acme Corp.",
            "The Acme engineer met with Bob.",         # -> Alice
            "Carol works at Acmee Labs.",              # typo'd key 'acmee'
            "The Acmee engineer joined Globex Corp.",  # -> Carol
            "The Acme engineer met with Dave.",        # still Alice
            "Erin and Frank work at Stark Corp.",      # commit max = Frank
            "The Stark engineer met with Grace.",      # -> Frank
            "The Wonka engineer met with Heidi."]      # unresolvable


def test_org_descriptor_contract():
    res = _resolved(_turns(SCENARIO))
    assert (1, "Alice", "met", "Bob", "definite_org") in res
    assert (3, "Carol", "joined", "Globex Corp", "definite_org") in res
    # typo'd surface never unifies with the clean key at resolution time
    assert (4, "Alice", "met", "Dave", "definite_org") in res
    # coordinated works_at commits the per-turn lexicographic max
    assert (6, "Frank", "met", "Grace", "definite_org") in res
    # unresolvable key emits nothing
    assert not any(t == 7 for (t, *_r) in res)


def test_org_descriptor_referent_feed():
    """The explicit person OBJECT of a resolved org descriptor feeds
    pronoun-referent state (kind-conditional: the org object of the
    joined variant does not)."""
    res = _resolved(_turns(["Alice works at Acme Corp.",
                            "The Acme engineer met with Bob.",
                            "She uses search daily."]))
    assert (2, "Bob", "uses", "search", "main") in res
    res = _resolved(_turns(["Alice works at Acme Corp.",
                            "The Acme engineer joined Globex Corp.",
                            "She uses search daily."]))
    # joined's org object commits nothing: referent stays Alice
    assert (2, "Alice", "uses", "search", "main") in res


def test_pronoun_works_at_never_commits_org_state():
    """A pronoun-RESOLVED works_at row feeds no org-keyed state."""
    res = _resolved(_turns(["Bob met with Alice.",
                            "She works at Tyrell Corp.",   # resolved row
                            "The Tyrell engineer met with Carol."]))
    # turn 1 resolves (Alice works at Tyrell) but commits no state
    assert (1, "Alice", "works_at", "Tyrell Corp", "main") in res
    assert not any(t == 2 for (t, *_r) in res)


def test_org_descriptor_four_way_lockstep(ray_session):
    rows = _turns(SCENARIO + [
        # aspect-form works_at also commits (same predicate family)
        "Judy is working at Umbrella Inc.",
        "The Umbrella engineer met with Karl."])
    o = _resolved(rows)
    assert (9, "Judy", "met", "Karl", "definite_org") in o
    r = _resolved_ray(rows)
    s = _resolved_sql(rows)
    assert r == o
    assert s == o


def test_org_descriptor_exttool_lockstep(ray_session):
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    tab = _table(_turns(SCENARIO))
    ds = ray.data.from_arrow(tab)
    ext = pa.concat_tables(
        [b for b in extract_events_external(ds)
         .iter_batches(batch_format="pyarrow") if b.num_rows]
    ).cast(X.S.EVENTS)
    inp = X.extract_events(tab)

    def key_set(t):
        return {tuple(r[c] for c in
                      ("turn_idx", "subj", "pred", "obj", "clause",
                       "desc_key"))
                for r in t.to_pylist()}
    assert key_set(ext) == key_set(inp)
    # descriptor events carry the lowercased org key
    assert any(r["desc_key"] == "acmee"
               for r in inp.to_pylist() if r["clause"] == "definite_org")


def test_synth_tracker_matches_engine():
    """synth's _works_at_commits (descriptor-generation state) agrees
    with the oracle resolution on generated corpora: every oracle-emitted
    definite_org row has a matching generator GT row (the tracker never
    disagrees with the contract), and the family really occurs."""
    rows, gts = synth.generate_corpus(120)
    o = oracle.extract_all(rows.to_pylist())
    emitted = {(d["conv_id"], d["turn_idx"], d["subj"].lower(), d["pred"])
               for d in o if d.get("clause") == "definite_org"}
    gt_keys = {(g["conv_id"], g["turn_idx"], g["subj"], g["pred"])
               for g in gts.to_pylist()}
    assert len(emitted) > 0      # the corpus really generates the family
    assert emitted <= gt_keys    # tracker-planted GT covers every emission
