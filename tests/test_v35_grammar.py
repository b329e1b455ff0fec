"""v35 construct semantics: ASPECT over the five intrinsically-past
SINGULAR families (met-with / joined / left / acquired / partnered) —
the v29 recipe applied to the singular is/was/has/had auxiliaries.

Contract (rules.py): aspect stays a SENTENCE-level lexical kernel —

  * progressive: 'is/was meeting with', 'is/was joining', 'is/was
    leaving', 'is/was acquiring', 'is/was partnering with' — the new
    participles join PROG_RE ('meeting' arrived with v29);
  * perfect: 'has/had met with', 'has/had joined', 'has/had left',
    'has/had acquired', 'has/had partnered with' — the participles join
    PERF_RE, and the one new IRREGULAR participle 'left' joins the
    PRES_PERFECT_RE tense carve-out ('has left' is non-past; 'had
    left' stays past via 'left');
  * simple stays the bare past (these verbs are intrinsically past in
    this grammar), and the v33 temporal adjunct composes with the
    perfect groups ('has joined Acme Corp since 2019.').

Reference precedent: the fork's per-relation structural attributes
(``DependencyJsonGenerator.scala:278-292``); v35 completes the aspect
coverage across every alternating SINGULAR relation family (only
reported_bug and the fixed-form constructs stay simple-only).
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
    return set(out)


# one sentence per (family × aspect × tense) cell; every obj below is a
# surface (resolved-triple subj/obj are surfaces at this stage)
V35_CASES = [
    # (text, [(pred, subj, obj)], is_past, aspect, since_year)
    ("Alice met with Bob.", [("met", "Alice", "Bob")],
     True, "simple", None),
    ("Alice is meeting with Bob.", [("met", "Alice", "Bob")],
     False, "progressive", None),
    ("Alice was meeting with Bob.", [("met", "Alice", "Bob")],
     True, "progressive", None),
    ("Alice has met with Bob.", [("met", "Alice", "Bob")],
     False, "perfect", None),
    ("Alice had met with Bob since 2014.", [("met", "Alice", "Bob")],
     True, "perfect", 2014),
    ("Carol joined Acme Corp.", [("joined", "Carol", "Acme Corp")],
     True, "simple", None),
    ("Carol is joining Acme Corp.", [("joined", "Carol", "Acme Corp")],
     False, "progressive", None),
    ("Carol was joining Acme Corp.", [("joined", "Carol", "Acme Corp")],
     True, "progressive", None),
    ("Carol has joined Acme Corp since 2021.",
     [("joined", "Carol", "Acme Corp")], False, "perfect", 2021),
    ("Carol had joined Acme Corp.", [("joined", "Carol", "Acme Corp")],
     True, "perfect", None),
    ("Dave left Globex Inc.", [("left_org", "Dave", "Globex Inc")],
     True, "simple", None),
    ("Dave is leaving Globex Inc.", [("left_org", "Dave", "Globex Inc")],
     False, "progressive", None),
    ("Dave was leaving Globex Inc.", [("left_org", "Dave", "Globex Inc")],
     True, "progressive", None),
    # the irregular-participle tense carve-out: 'has left' is NON-past
    ("Dave has left Globex Inc.", [("left_org", "Dave", "Globex Inc")],
     False, "perfect", None),
    ("Dave had left Globex Inc.", [("left_org", "Dave", "Globex Inc")],
     True, "perfect", None),
    ("Stark Labs acquired Wayne Corp.",
     [("acquired", "Stark Labs", "Wayne Corp")], True, "simple", None),
    ("Stark Labs is acquiring Wayne Corp.",
     [("acquired", "Stark Labs", "Wayne Corp")],
     False, "progressive", None),
    ("Stark Labs has acquired Wayne Corp.",
     [("acquired", "Stark Labs", "Wayne Corp")], False, "perfect", None),
    ("Hooli Inc partnered with Initech Labs.",
     [("partnered", "Hooli Inc", "Initech Labs")], True, "simple", None),
    ("Hooli Inc was partnering with Initech Labs.",
     [("partnered", "Hooli Inc", "Initech Labs")],
     True, "progressive", None),
    ("Hooli Inc has partnered with Initech Labs since 2019.",
     [("partnered", "Hooli Inc", "Initech Labs")],
     False, "perfect", 2019),
]


def test_v35_contract_per_cell():
    """Oracle: every (family × aspect × tense) cell emits its expected
    rows with the contract attribute values."""
    for text, emis, past, asp, since in V35_CASES:
        out = oracle.extract_conversation(_turns([text]))
        got = {tuple(d[k] for k in _KEY) for d in out}
        want = {(0, s, p, o, 0, "main", past, asp, since)
                for p, s, o in emis}
        assert got == want, text


def test_v35_four_way_lockstep(ray_session):
    """Arrow kernel, Python oracle and DuckDB SQL mirror agree row-for-row
    on one conversation holding every v35 cell."""
    rows = _turns([t for t, *_ in V35_CASES])
    o = _resolved(rows)
    r = _resolved_ray(rows)
    s = _resolved_sql(rows)
    assert r == o
    assert s == o
    assert {a for (*_, a, _sy) in o} == {"simple", "progressive", "perfect"}


def test_v35_exttool_lockstep(ray_session):
    """The subprocess worker (4th implementation) emits identical events
    for the v35 cells."""
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = _turns([t for t, *_ in V35_CASES])
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


def test_v35_state_semantics_preserved():
    """Aspect forms change the surface, not the state contract: the met
    object still shadows the subject for referent state, a joined
    subject still commits, and the v28 org-keyed descriptor state still
    commits only from works_at (an aspect-formed 'joined' never feeds
    it)."""
    rows = _turns(["Alice has met with Bob.",
                   "She is using search daily."])
    o = {tuple(d[k] for k in ("turn_idx", "subj", "pred", "obj"))
         for d in oracle.extract_conversation(rows)}
    assert (1, "Bob", "uses", "search") in o  # obj shadows subj

    rows = _turns(["Carol is joining Acme Corp.",
                   "She works at Globex Inc."])
    o = {tuple(d[k] for k in ("turn_idx", "subj", "pred", "obj"))
         for d in oracle.extract_conversation(rows)}
    assert (1, "Carol", "works_at", "Globex Inc") in o

    # org-descriptor state is works_at-keyed: a 'has joined' turn commits
    # no (org -> person) state, so the descriptor stays unresolved
    rows = _turns(["Carol has joined Acme Corp.",
                   "The Acme engineer met with Bob."])
    o = oracle.extract_conversation(rows)
    assert not any(d["clause"] == R.DESC_ORG_CLAUSE for d in o)


def test_v35_disjointness_regressions():
    """The extended alternations never leak into neighbouring templates:
    descriptor met-with stays on the descriptor path, the reciprocal
    keeps its plural auxiliaries, and the one family left simple-only
    stays unmatched under an aspect form."""
    out = oracle.extract_conversation(
        _turns(["Alice works at Acme Corp.",
                "The maintainer of auth.core met with Bob."]))
    # no maintains state committed -> the descriptor emits nothing, and
    # the singular met template must NOT have matched the descriptor text
    assert not any(d["pred"] == "met" for d in out)
    # recip: 'have met' (plural) still routes to the reciprocal template
    out = oracle.extract_conversation(_turns(["Alice and Bob have met."]))
    assert {d["clause"] for d in out} == {"reciprocal"}
    # singular perfect routes to the single template, one row only
    out = oracle.extract_conversation(_turns(["Alice has met with Bob."]))
    assert [(d["pred"], d["clause"]) for d in out] == [("met", "main")]
    # reported_bug stays simple-only
    out = oracle.extract_conversation(
        _turns(["Alice is reporting a bug in auth.core."]))
    assert out == []


def test_v35_synth_corpus_carries_new_cells():
    """The v35 corpus generates real positives for every new family ×
    aspect cell (presence; corpus-wide P/R is asserted in
    test_kg_pipeline)."""
    rows, _gts = synth.generate_corpus(2000)
    o = oracle.extract_all(rows.to_pylist())
    cells = {(d["pred"], d.get("aspect")) for d in o
             if d.get("clause") == "main"}
    for want in [("met", "progressive"), ("met", "perfect"),
                 ("joined", "progressive"), ("joined", "perfect"),
                 ("left_org", "progressive"), ("left_org", "perfect"),
                 ("acquired", "progressive"), ("acquired", "perfect"),
                 ("partnered", "progressive"), ("partnered", "perfect")]:
        assert want in cells, want
    # the since adjunct composes with the new perfect groups
    assert any(d.get("since_year") is not None and d["pred"] == "joined"
               for d in o)
