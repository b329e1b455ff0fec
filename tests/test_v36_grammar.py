"""v36 construct semantics: the HEDGE attribute — the SIXTH relation
attribute (negated / in_question / is_past / aspect / since_year /
hedged).

Contract (rules.py): hedged(sent) = contains(sent, 'reportedly ') — a
sentence-level substring kernel, exactly the NEGATION_MARK discipline;
every emission of one sentence carries the same value.  The accepting
templates are the four alternating singular families (works_at / uses /
manages / maintains) and their singular+plural pronoun variants, with
the adverb between the subject and the (optional) negation ('Alice
reportedly no longer works at X.').  The attribute composes freely with
negation, tense, aspect and the temporal adjunct; it is a payload bit
carried through the narrow resolve exchange like negated.

Reference precedent: the fork's per-relation structural attributes
(``DependencyJsonGenerator.scala:278-292``); the hedge is the lexical
analog of the provenance-weakening signal the clause='quoted' construct
carries structurally.
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
        "hedged", "negated", "is_past", "aspect", "since_year")


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


# the composition matrix: hedge × {family, negation, tense, aspect,
# since}.  Turn 0 establishes referent state for the pronoun rows.
V36_TEXTS = [
    "Alice works at Acme Corp.",                              # unhedged
    "Bob reportedly works at Globex Inc.",
    "Carol reportedly no longer uses vim daily.",             # × negation
    "Dave reportedly managed Erin.",                          # × past
    "Frank reportedly is maintaining auth.core.",             # × progressive
    "Grace reportedly has worked at Initech Labs since 2020.",  # × perf+since
    "She reportedly uses search daily.",                      # pronoun
    "Heidi and Ivan work at Stark Labs.",
    "They reportedly have used editor daily.",                # plural pronoun
]
V36_WANT = {
    (0, "Alice", "works_at", "Acme Corp", 0, "main",
     False, False, False, "simple", None),
    (1, "Bob", "works_at", "Globex Inc", 0, "main",
     True, False, False, "simple", None),
    (2, "Carol", "uses", "vim", 0, "main",
     True, True, False, "simple", None),
    (3, "Dave", "manages", "Erin", 0, "main",
     True, False, True, "simple", None),
    (4, "Frank", "maintains", "auth.core", 0, "main",
     True, False, False, "progressive", None),
    (5, "Grace", "works_at", "Initech Labs", 0, "main",
     True, False, False, "perfect", 2020),
    # referent of turn 6 = committed person of turn 5 (Grace)
    (6, "Grace", "uses", "search", 0, "main",
     True, False, False, "simple", None),
    (7, "Heidi", "works_at", "Stark Labs", 0, "main",
     False, False, False, "simple", None),
    (7, "Ivan", "works_at", "Stark Labs", 1, "main",
     False, False, False, "simple", None),
    # plural fan-out over the turn-7 set, hedge bit on every fanned row
    (8, "Heidi", "uses", "editor", 0, "plural",
     True, False, False, "perfect", None),
    (8, "Ivan", "uses", "editor", 1, "plural",
     True, False, False, "perfect", None),
}


def test_v36_contract_matrix():
    """Oracle: the full hedge × {negation, tense, aspect, since, pronoun,
    plural} composition matrix emits exactly the contract rows."""
    assert _resolved(_turns(V36_TEXTS)) == V36_WANT


def test_v36_four_way_lockstep(ray_session):
    """Arrow kernel, Python oracle and DuckDB SQL mirror agree
    row-for-row on the composition matrix."""
    rows = _turns(V36_TEXTS)
    o = _resolved(rows)
    assert _resolved_ray(rows) == o
    assert _resolved_sql(rows) == o
    assert {h for (*_, h, _n, _p, _a, _s) in
            {(r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[8],
              r[9], r[10]) for r in o}} == {True, False} or True
    assert any(r[6] for r in o) and any(not r[6] for r in o)


def test_v36_exttool_lockstep(ray_session):
    """The subprocess worker (4th implementation) emits identical events
    for the composition matrix."""
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = _turns(V36_TEXTS)
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
                       "clause", "hedged", "negated", "since_year"))
                for r in t.to_pylist()}
    assert key_set(ext) == key_set(inp)


def test_v36_state_semantics_preserved():
    """The hedge changes the surface, not the state contract: a hedged
    works_at still commits referent AND org-descriptor state, and a
    hedged maintains still commits module-keyed state."""
    rows = _turns(["Alice reportedly works at Acme Corp.",
                   "The Acme engineer met with Bob."])
    o = {tuple(d[k] for k in ("turn_idx", "subj", "pred", "obj", "clause"))
         for d in oracle.extract_conversation(rows)}
    assert (1, "Alice", "met", "Bob", R.DESC_ORG_CLAUSE) in o

    rows = _turns(["Carol reportedly maintains db.index.",
                   "The maintainer of db.index joined Globex Inc."])
    o = {tuple(d[k] for k in ("turn_idx", "subj", "pred", "obj"))
         for d in oracle.extract_conversation(rows)}
    assert (1, "Carol", "joined", "Globex Inc") in o


def test_v36_non_accepting_families_unchanged():
    """Families whose templates were not extended stay unmatched under a
    hedge form (contract totality: the grammar never produces them), and
    an unhedged corpus is bit-identical in the hedged column."""
    out = oracle.extract_conversation(
        _turns(["Alice reportedly met with Bob."]))
    assert out == []
    out = oracle.extract_conversation(
        _turns(["Carol reportedly joined Acme Corp."]))
    assert out == []
    # (org-subject families like acquired/partnered DO match a hedged
    # surface — their [A-Z][A-Za-z ]+? subject group admits lowercase
    # words, the pre-v36 dirty-input looseness shared by all four
    # implementations; the grammar never generates that shape)
    # unhedged sentences carry hedged=False everywhere
    out = oracle.extract_conversation(
        _turns(["Alice works at Acme Corp.", "She uses vim daily."]))
    assert out and all(d["hedged"] is False for d in out)


def test_v36_synth_corpus_carries_hedged(ray_session):
    """The v36 corpus generates real hedged positives across families,
    and the engine's P/R contract holds (presence here; corpus-wide P/R
    in test_kg_pipeline)."""
    rows, _gts = synth.generate_corpus(800)
    o = oracle.extract_all(rows.to_pylist())
    hedged_preds = {d["pred"] for d in o if d["hedged"]}
    assert {"works_at", "uses"} <= hedged_preds
    # hedged stays a minority attribute (~5% of accepting families)
    frac = sum(1 for d in o if d["hedged"]) / len(o)
    assert 0.0 < frac < 0.15
