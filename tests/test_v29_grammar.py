"""v29 construct semantics: ASPECT over the ditransitive / reciprocal /
quoted verb families — the three families v27 left at simple aspect.

Contract (rules.py): aspect stays a SENTENCE-level lexical kernel; v29
extends the alternations, not the rule —

  * ditransitive ('introduced', plain and quoted-nested): progressive
    'is/was introducing', perfect 'has/had introduced'; simple is the
    bare past ('introduced' is intrinsically past in this grammar, so
    simple + past compose).
  * reciprocal ('met' under a coordinated subject): the PLURAL subject
    selects are/were (progressive) and have/had (perfect) — 'were'
    joins PAST_RE and 'have' + the irregular participle 'met' join the
    PRES_PERFECT_RE carve-out ('have met' is non-past; 'had met' and
    'were meeting' are past).
  * quoted speech: the inner uses-family verb group gains its full
    alternation ('X said "Alice is using vim daily."').

Reference precedent: the fork's per-relation structural attributes
(``DependencyJsonGenerator.scala:278-292``); v29 completes the aspect
coverage across every multi-slot construct family.
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
        "is_past", "aspect")


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


# one sentence per (family × aspect × tense) cell
V29_CASES = [
    # (text, [(pred, subj, obj, slot_idx, clause)], is_past, aspect)
    ("Alice introduced Bob to Carol.",
     [("introduced", "Alice", "Bob", 0, "ditransitive"),
      ("introduced", "Alice", "Carol", 1, "ditransitive")],
     True, "simple"),
    ("Alice is introducing Bob to Carol.",
     [("introduced", "Alice", "Bob", 0, "ditransitive"),
      ("introduced", "Alice", "Carol", 1, "ditransitive")],
     False, "progressive"),
    ("Alice was introducing Bob to Carol.",
     [("introduced", "Alice", "Bob", 0, "ditransitive"),
      ("introduced", "Alice", "Carol", 1, "ditransitive")],
     True, "progressive"),
    ("Alice has introduced Bob to Carol.",
     [("introduced", "Alice", "Bob", 0, "ditransitive"),
      ("introduced", "Alice", "Carol", 1, "ditransitive")],
     False, "perfect"),
    ("Alice had introduced Bob to Carol.",
     [("introduced", "Alice", "Bob", 0, "ditransitive"),
      ("introduced", "Alice", "Carol", 1, "ditransitive")],
     True, "perfect"),
    ("Alice and Bob met.",
     [("met", "Alice", "Bob", 0, "reciprocal"),
      ("met", "Bob", "Alice", 1, "reciprocal")],
     True, "simple"),
    ("Alice and Bob are meeting.",
     [("met", "Alice", "Bob", 0, "reciprocal"),
      ("met", "Bob", "Alice", 1, "reciprocal")],
     False, "progressive"),
    ("Alice and Bob were meeting.",
     [("met", "Alice", "Bob", 0, "reciprocal"),
      ("met", "Bob", "Alice", 1, "reciprocal")],
     True, "progressive"),
    ("Alice and Bob have met.",
     [("met", "Alice", "Bob", 0, "reciprocal"),
      ("met", "Bob", "Alice", 1, "reciprocal")],
     False, "perfect"),
    ("Alice and Bob had met.",
     [("met", "Alice", "Bob", 0, "reciprocal"),
      ("met", "Bob", "Alice", 1, "reciprocal")],
     True, "perfect"),
    ('Dan said "Erin is using vim daily."',
     [("uses", "Erin", "vim", 0, "quoted")], False, "progressive"),
    ('Dan said "Erin was using vim daily."',
     [("uses", "Erin", "vim", 0, "quoted")], True, "progressive"),
    ('Dan said "Erin has used vim daily."',
     [("uses", "Erin", "vim", 0, "quoted")], False, "perfect"),
    ('Dan said "Erin had used vim daily."',
     [("uses", "Erin", "vim", 0, "quoted")], True, "perfect"),
    ('Dan said "Erin has introduced Frank to Grace."',
     [("introduced", "Erin", "Frank", 0, "quoted"),
      ("introduced", "Erin", "Grace", 1, "quoted")],
     False, "perfect"),
    ('Dan said "Erin was introducing Frank to Grace."',
     [("introduced", "Erin", "Frank", 0, "quoted"),
      ("introduced", "Erin", "Grace", 1, "quoted")],
     True, "progressive"),
]


def test_v29_contract_per_cell():
    """Oracle: every (family × aspect × tense) cell emits its expected
    rows with the contract attribute values."""
    for text, emis, past, asp in V29_CASES:
        out = oracle.extract_conversation(_turns([text]))
        got = {tuple(d[k] for k in _KEY) for d in out}
        want = {(0, s, p, o, sl, cl, past, asp) for p, s, o, sl, cl in emis}
        assert got == want, text


def test_v29_four_way_lockstep(ray_session):
    """Arrow kernel, Python oracle and DuckDB SQL mirror agree row-for-row
    on one conversation holding every v29 cell."""
    rows = _turns([t for t, *_ in V29_CASES])
    o = _resolved(rows)
    r = _resolved_ray(rows)
    s = _resolved_sql(rows)
    assert r == o
    assert s == o
    assert {a for (*_, a) in o} == {"simple", "progressive", "perfect"}


def test_v29_exttool_lockstep(ray_session):
    """The subprocess worker (4th implementation) emits identical events
    for the v29 cells."""
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = _turns([t for t, *_ in V29_CASES])
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
                       "clause", "is_past", "aspect"))
                for r in t.to_pylist()}
    assert key_set(ext) == key_set(inp)


def test_v29_state_semantics_preserved():
    """Aspect forms change the surface, not the state contract: the
    reciprocal / ditransitive person objects still feed referent state
    (turn max) and a later pronoun resolves through them."""
    rows = _turns(["Alice and Bob were meeting.",
                   "She has used search daily."])
    o = {tuple(d[k] for k in ("turn_idx", "subj", "pred", "obj"))
         for d in oracle.extract_conversation(rows)}
    assert (1, "Bob", "uses", "search") in o  # referent = max(Alice, Bob)

    rows = _turns(["Carol is introducing Dave to Erin.",
                   "He works at Acme Corp."])
    o = {tuple(d[k] for k in ("turn_idx", "subj", "pred", "obj"))
         for d in oracle.extract_conversation(rows)}
    assert (1, "Erin", "works_at", "Acme Corp") in o  # max(Dave, Erin)


def test_v29_disjointness_regressions():
    """The extended alternations never leak into neighbouring templates:
    'met with' still routes to the single met template, coordination to
    coord_works_at, and no aspect form double-matches."""
    out = oracle.extract_conversation(_turns(["Alice met with Bob."]))
    assert [(d["pred"], d["clause"]) for d in out] == [("met", "main")]
    out = oracle.extract_conversation(
        _turns(["Alice and Bob work at Acme Corp."]))
    assert {d["clause"] for d in out} == {"main"}
    # an aspect form of a family NOT extended stays unmatched (contract
    # totality: templates simply never produce it).  'is joining' was
    # this test's example until v35 extended that family; reported_bug
    # remains simple-only.
    out = oracle.extract_conversation(
        _turns(["Alice is reporting a bug in auth.core."]))
    assert out == []


def test_v29_synth_corpus_carries_new_cells():
    """The v29 corpus generates real positives for every new family ×
    aspect cell (presence; corpus-wide P/R is asserted in
    test_kg_pipeline)."""
    # 1500 convs: the rarest cell (reciprocal × perfect, ~7% of ~0.4%
    # of turns) needs a larger draw after the v32 plural-pair branch
    # shifted the per-conversation RNG stream
    rows, _gts = synth.generate_corpus(1500)
    o = oracle.extract_all(rows.to_pylist())
    cells = {(d["pred"], d.get("clause"), d.get("aspect")) for d in o}
    for want in [("introduced", "ditransitive", "progressive"),
                 ("introduced", "ditransitive", "perfect"),
                 ("met", "reciprocal", "progressive"),
                 ("met", "reciprocal", "perfect"),
                 ("uses", "quoted", "progressive"),
                 ("uses", "quoted", "perfect")]:
        assert want in cells, want
