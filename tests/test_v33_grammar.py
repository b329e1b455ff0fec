"""v33 construct semantics: the SINCE-<year> temporal adjunct — the FIFTH
relation attribute (after negated / in_question / is_past / aspect).

Contract (rules.py): ``since_year`` is a SENTENCE-level lexical kernel —

    since_year(sent) = int(year) if sent matches SINCE_RE
                       (' since <year>' at the sentence END) else NULL

The adjunct is ACCEPTED by the four alternating singular families
(works_at / uses / maintains / manages) plus the singular and PLURAL
pronoun variants (their regexes gain the shared optional SINCE_OPT
fragment); it is GENERATED only with the perfect verb groups ('has/had
worked at X since 2019' — natural English), but the kernel is lexical so
the contract stays total on any since-suffixed form.  The value is a
PAYLOAD attribute: it rides the narrow resolve exchange and must survive
pronoun resolution and the v32 plural set expansion unchanged on every
fanned-out row.

Reference precedent: the fork's per-relation structural attribute family
(``DependencyJsonGenerator.scala:278-292``) — v33 takes the engine to
five sentence-level attributes plus the slot/clause structural pair.
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


_KEY = ("turn_idx", "subj", "pred", "obj", "slot_idx", "clause",
        "is_past", "aspect", "since_year")


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
    out = con.sql("SELECT " + ", ".join(_KEY) + f" FROM ({sql})").fetchall()
    con.close()
    return {(t, s, p, o, sl, cl, ip, a,
             int(sy) if sy is not None else None)
            for (t, s, p, o, sl, cl, ip, a, sy) in out}


# one sentence per (family × since-presence) cell; tense/aspect compose
V33_CASES = [
    # (text, [(pred, subj, obj, slot, clause)], is_past, aspect, since)
    ("Alice has worked at Stark Labs since 2019.",
     [("works_at", "Alice", "Stark Labs", 0, "main")],
     False, "perfect", 2019),
    ("Alice had worked at Stark Labs since 2012.",
     [("works_at", "Alice", "Stark Labs", 0, "main")],
     True, "perfect", 2012),
    ("Bob has used vim daily since 2021.",
     [("uses", "Bob", "vim", 0, "main")], False, "perfect", 2021),
    ("Carol had maintained auth.core since 2015.",
     [("maintains", "Carol", "auth.core", 0, "main")],
     True, "perfect", 2015),
    ("Dave has managed Erin since 2020.",
     [("manages", "Dave", "Erin", 0, "main")], False, "perfect", 2020),
    # '?' terminator composes (SINCE_RE ends [.?]$)
    ("Frank has worked at Wonka Labs since 2018?",
     [("works_at", "Frank", "Wonka Labs", 0, "main")],
     False, "perfect", 2018),
    # no adjunct ⇒ NULL (every earlier grammar row is unchanged)
    ("Grace has worked at Acme Corp.",
     [("works_at", "Grace", "Acme Corp", 0, "main")],
     False, "perfect", None),
    ("Heidi works at Acme Corp.",
     [("works_at", "Heidi", "Acme Corp", 0, "main")],
     False, "simple", None),
]


def test_v33_contract_per_cell():
    """Oracle: every since cell emits its expected rows with the
    contract attribute values (year int, NULL when absent)."""
    for text, emis, past, asp, since in V33_CASES:
        out = oracle.extract_conversation(_turns([text]))
        got = {tuple(d[k] for k in _KEY) for d in out}
        want = {(0, s, p, obj, sl, cl, past, asp, since)
                for p, s, obj, sl, cl in emis}
        assert got == want, text


def test_v33_four_way_lockstep(ray_session):
    """Arrow kernel, Python oracle and DuckDB SQL mirror agree row-for-row
    on one conversation holding every v33 cell."""
    rows = _turns([t for t, *_ in V33_CASES])
    o = _resolved(rows)
    r = _resolved_ray(rows)
    s = _resolved_sql(rows)
    assert r == o
    assert s == o
    assert {y for (*_, y) in o if y} == {2019, 2012, 2021, 2015, 2020,
                                         2018}


def test_v33_exttool_lockstep(ray_session):
    """The subprocess worker (4th implementation) emits identical events
    for the v33 cells, since_year included."""
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = _turns([t for t, *_ in V33_CASES])
    tab = _table(rows)
    ds = ray.data.from_arrow(tab)
    ext = pa.concat_tables(
        [b for b in extract_events_external(ds)
         .iter_batches(batch_format="pyarrow") if b.num_rows]
    ).cast(X.S.EVENTS)
    inp = X.extract_events(tab)

    def key_set(t):
        return {tuple(r[c] for c in
                      ("turn_idx", "subj", "pred", "obj", "slot_idx",
                       "clause", "is_past", "aspect", "since_year"))
                for r in t.to_pylist()}
    assert key_set(ext) == key_set(inp)


def test_v33_since_survives_pronoun_and_plural_resolution(ray_session):
    """The adjunct is a payload attribute: a since-bearing pronoun turn
    resolves with its year intact, and a since-bearing PLURAL turn fans
    the SAME year out to every member row (slot ranks unchanged)."""
    rows = _turns([
        "Erin and Frank have worked at Acme Corp.",    # commits {E, F}
        "They have worked at Globex Inc since 2018.",  # plural + since
        "She has used vim daily since 2021.",          # singular pronoun
    ])
    for impl in (_resolved, _resolved_ray, _resolved_sql):
        got = impl(rows)
        assert (1, "Erin", "works_at", "Globex Inc", 0, "plural",
                False, "perfect", 2018) in got, impl
        assert (1, "Frank", "works_at", "Globex Inc", 1, "plural",
                False, "perfect", 2018) in got, impl
        # singular referent = max(set) = Frank
        assert (2, "Frank", "uses", "vim", 0, "main",
                False, "perfect", 2021) in got, impl


def test_v33_state_semantics_preserved():
    """The adjunct changes no state rule: a since-suffixed works_at still
    commits org-keyed descriptor state AND referent state; a
    since-suffixed maintains still commits module-keyed state."""
    rows = _turns(["Alice has worked at Acme Corp since 2019.",
                   "The Acme engineer met with Bob."])
    o = {tuple(d[k] for k in ("turn_idx", "subj", "pred", "obj"))
         for d in oracle.extract_conversation(rows)}
    assert (1, "Alice", "met", "Bob") in o
    rows = _turns(["Carol had maintained db.index since 2014.",
                   "The maintainer of db.index met with Dave."])
    o = {tuple(d[k] for k in ("turn_idx", "subj", "pred", "obj"))
         for d in oracle.extract_conversation(rows)}
    assert (1, "Carol", "met", "Dave") in o


def test_v33_sentence_level_and_disjointness():
    """The kernel is sentence-level (each sentence of a multi-sentence
    turn classifies independently) and the suffix leaks into no
    non-accepting template."""
    out = oracle.extract_conversation(_turns(
        ["Alice has worked at Acme Corp since 2019. Bob uses vim daily."]))
    by_subj = {d["subj"]: d["since_year"] for d in out}
    assert by_subj == {"Alice": 2019, "Bob": None}
    # a non-accepting family with a since-ish tail simply never matches
    # (contract totality: the sentence is unparsed, not misparsed)
    out = oracle.extract_conversation(_turns(
        ["Alice and Bob have worked at Acme Corp since 2019."]))
    assert out == []
    # quoted sentences end '."' — the anchored kernel never fires inside
    out = oracle.extract_conversation(_turns(
        ['Dan said "Erin has used vim daily."']))
    assert [(d["subj"], d["since_year"]) for d in out] == [("Erin", None)]


def test_v33_synth_corpus_carries_since():
    """The v33 corpus generates real since positives across families and
    both pronoun variants (presence; corpus-wide P/R is asserted in
    test_kg_pipeline)."""
    rows, _gts = synth.generate_corpus(1500)
    o = oracle.extract_all(rows.to_pylist())
    withy = [d for d in o if d.get("since_year")]
    assert len(withy) > 50
    preds = {d["pred"] for d in withy}
    assert {"works_at", "uses", "maintains", "manages"} <= preds
    assert all(1200 <= d["since_year"] <= 2999 for d in withy)
    # the plural fan-out carries it too
    assert any(d.get("clause") == "plural" for d in withy)
