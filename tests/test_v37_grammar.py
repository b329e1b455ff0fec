"""v37 construct semantics: the HEDGE attribute over the MULTI-SLOT
construct families — coordination (2-way / 3-way / open list),
reciprocal, ditransitive, quoted speech, the passive, and the plural
reciprocal.

Contract (rules.py): the kernel is UNCHANGED from v36 — hedged =
contains(sent, 'reportedly '), sentence-level, every emission of one
sentence carries the same value.  v37 only extends WHICH templates can
produce the token:

  * coordinated subjects: 'Alice and Bob reportedly work at X.' — the
    adverb sits between the (coordinated) subject and the verb group,
    exactly the v36 position;
  * reciprocal: 'Alice and Bob reportedly met.'; plural reciprocal:
    'They reportedly met.' (every fanned-out ordered pair carries the
    bit);
  * ditransitive: 'Alice reportedly introduced Bob to Carol.' — BOTH
    emissions of the sentence carry hedged=true (the sentence-level
    rule);
  * quoted speech: 'X said "Alice reportedly uses vim daily."' — the
    hedge belongs to the QUOTED claim; the emission keeps clause
    'quoted';
  * passive: 'auth.core reportedly is maintained by Alice.' — the
    adverb precedes the auxiliary chain, so the v24/v31 tense
    carve-outs (PRES_PASSIVE_RE / PRES_PERFECT_RE) still see their
    unbroken 'is ... maintained' / 'has been' token sequences and need
    NO changes (the zero-kernel-edit position).

Reference precedent: the fork's per-relation structural attributes
(``DependencyJsonGenerator.scala:278-292``).
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


_KEY = ("turn_idx", "subj", "pred", "obj", "slot_idx", "clause",
        "hedged", "is_past", "aspect")


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


V37_CASES = [
    # (text, {(subj, pred, obj, slot_idx, clause)}, is_past, aspect)
    ("Alice and Bob reportedly work at Acme Corp.",
     {("Alice", "works_at", "Acme Corp", 0, "main"),
      ("Bob", "works_at", "Acme Corp", 1, "main")}, False, "simple"),
    ("Carol and Dave reportedly have used vim daily.",
     {("Carol", "uses", "vim", 0, "main"),
      ("Dave", "uses", "vim", 1, "main")}, False, "perfect"),
    ("Erin, Frank and Grace reportedly were working at Globex Inc.",
     {("Erin", "works_at", "Globex Inc", 0, "main"),
      ("Frank", "works_at", "Globex Inc", 1, "main"),
      ("Grace", "works_at", "Globex Inc", 2, "main")},
     True, "progressive"),
    ("Heidi, Ivan, Judy and Karl reportedly work at Initech Labs.",
     {("Heidi", "works_at", "Initech Labs", 0, "main"),
      ("Ivan", "works_at", "Initech Labs", 1, "main"),
      ("Judy", "works_at", "Initech Labs", 2, "main"),
      ("Karl", "works_at", "Initech Labs", 3, "main")}, False, "simple"),
    ("Alice and Bob reportedly met.",
     {("Alice", "met", "Bob", 0, "reciprocal"),
      ("Bob", "met", "Alice", 1, "reciprocal")}, True, "simple"),
    ("Carol reportedly introduced Dave to Erin.",
     {("Carol", "introduced", "Dave", 0, "ditransitive"),
      ("Carol", "introduced", "Erin", 1, "ditransitive")},
     True, "simple"),
    ('Frank said "Grace reportedly uses search daily."',
     {("Grace", "uses", "search", 0, "quoted")}, False, "simple"),
    ("auth.core reportedly is maintained by Heidi.",
     {("Heidi", "maintains", "auth.core", 0, "passive")},
     False, "simple"),
    ("db.index reportedly has been maintained by Ivan.",
     {("Ivan", "maintains", "db.index", 0, "passive")},
     False, "perfect"),
]


def test_v37_contract_per_cell():
    """Oracle: every extended family emits its rows with hedged=true and
    the correct tense/aspect composition (the passive carve-outs intact
    under the pre-auxiliary adverb)."""
    for text, emis, past, asp in V37_CASES:
        out = oracle.extract_conversation(_turns([text]))
        got = {tuple(d[k] for k in _KEY) for d in out}
        want = {(0, s, p, o, sl, cl, True, past, asp)
                for s, p, o, sl, cl in emis}
        assert got == want, text


def test_v37_plural_recip_hedged():
    """'They reportedly met.' — every fanned-out ordered pair carries
    the hedge bit."""
    rows = _turns(["Alice and Bob work at Acme Corp.",
                   "They reportedly had met."])
    out = [d for d in oracle.extract_conversation(rows)
           if d["turn_idx"] == 1]
    got = {(d["subj"], d["obj"], d["slot_idx"], d["hedged"], d["aspect"])
           for d in out}
    assert got == {("Alice", "Bob", 0, True, "perfect"),
                   ("Bob", "Alice", 1, True, "perfect")}


def test_v37_four_way_lockstep(ray_session):
    """Arrow kernel, Python oracle and DuckDB SQL mirror agree
    row-for-row on one conversation holding every v37 cell."""
    rows = _turns([t for t, *_ in V37_CASES])
    o = _resolved(rows)
    assert _resolved_ray(rows) == o
    assert _resolved_sql(rows) == o


def test_v37_exttool_lockstep(ray_session):
    """The subprocess worker (4th implementation) emits identical
    events for the v37 cells."""
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = (_turns([t for t, *_ in V37_CASES])
            + _turns(["Alice and Bob work at Acme Corp.",
                      "They reportedly met."], conv="convB"))
    tab = _table(rows)
    ds = ray.data.from_arrow(tab)
    ext = pa.concat_tables(
        [b for b in extract_events_external(ds)
         .iter_batches(batch_format="pyarrow") if b.num_rows]
    ).cast(X.S.EVENTS)
    inp = X.extract_events(tab)

    def key_set(t):
        return {tuple(r[c] for c in
                      ("conv_id", "turn_idx", "subj", "pred", "obj",
                       "slot_idx", "clause", "hedged"))
                for r in t.to_pylist()}
    assert key_set(ext) == key_set(inp)


def test_v37_unhedged_forms_unchanged():
    """Every v37 family still matches its unhedged surface with
    hedged=false — the alternations are strictly additive."""
    for text, emis, past, asp in V37_CASES:
        plain = text.replace("reportedly ", "")
        out = oracle.extract_conversation(_turns([plain]))
        got = {tuple(d[k] for k in _KEY) for d in out}
        want = {(0, s, p, o, sl, cl, False, past, asp)
                for s, p, o, sl, cl in emis}
        assert got == want, plain


def test_v37_synth_corpus_carries_hedged_constructs(ray_session):
    """The v37 corpus generates hedged positives in the multi-slot
    families (presence; corpus-wide P/R in test_kg_pipeline)."""
    rows, _gts = synth.generate_corpus(2500)
    o = oracle.extract_all(rows.to_pylist())
    hedged_clauses = {d["clause"] for d in o if d["hedged"]}
    for want in ("main", "reciprocal", "ditransitive", "quoted",
                 "passive"):
        assert want in hedged_clauses, want
    assert any(d["hedged"] and d["slot_idx"] >= 1 for d in o)
