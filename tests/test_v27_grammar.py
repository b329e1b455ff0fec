"""v27 construct semantics: the ASPECT relation attribute
(simple | progressive | perfect).

Contract (rules.py): aspect is SENTENCE-level and lexical, like
negated / in_question / is_past —

    aspect(sent) = 'progressive' if PROG_RE  ('is|was' + V-ing)
                   'perfect'     if PERF_RE  ('has|had' + V-ed)
                   'simple'      otherwise

and the is_past contract gains the present-perfect carve-out: 'has
worked' is NOT past (the participle after 'has' is a present perfect),
while 'had worked' (past perfect) and 'was working' (past progressive)
remain past.  The four alternating verb families (works_at / uses /
maintains / manages, incl. the pronoun templates) admit the new verb
groups; every other template only ever produces simple-aspect
sentences, so the contract stays total.

Reference precedent: the fork's per-relation structural attributes
(``DependencyJsonGenerator.scala:278-292`` — a 3-attribute family);
aspect is the engine's fourth attribute after negated / in_question /
is_past.
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


_KEY = ("turn_idx", "subj", "pred", "obj", "is_past", "aspect")


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
    out = con.sql("SELECT turn_idx, subj, pred, obj, is_past, aspect "
                  f"FROM ({sql})").fetchall()
    con.close()
    return set(out)


# one sentence per (family × aspect × tense) cell, plus the carve-out
# interactions with the passive and perfect constructs
ASPECT_CASES = [
    # (text, pred, is_past, aspect)
    ("Alice works at Acme Corp.", "works_at", False, "simple"),
    ("Alice worked at Acme Corp.", "works_at", True, "simple"),
    ("Alice is working at Acme Corp.", "works_at", False, "progressive"),
    ("Alice was working at Acme Corp.", "works_at", True, "progressive"),
    ("Alice has worked at Acme Corp.", "works_at", False, "perfect"),
    ("Alice had worked at Acme Corp.", "works_at", True, "perfect"),
    ("Bob is using search daily.", "uses", False, "progressive"),
    ("Bob had used search daily.", "uses", True, "perfect"),
    ("Carol is maintaining auth.core.", "maintains", False, "progressive"),
    ("Carol has maintained auth.core.", "maintains", False, "perfect"),
    ("Dave was managing Erin.", "manages", True, "progressive"),
    ("Dave had managed Erin.", "manages", True, "perfect"),
    # present passive stays simple + non-past (v24 carve-out unchanged)
    ("auth.core is maintained by Frank.", "maintains", False, "simple"),
    # past passive: simple aspect, past via 'was'
    ("auth.core was maintained by Frank.", "maintains", True, "simple"),
]


def test_aspect_contract_per_family():
    """Oracle: every (family × aspect × tense) cell carries the contract
    values; the passive participles never classify as PROG/PERF."""
    for text, pred, past, asp in ASPECT_CASES:
        out = oracle.extract_conversation(_turns([text]))
        assert len(out) == 1, text
        d = out[0]
        assert d["pred"] == pred, text
        assert d["is_past"] is past, text
        assert d["aspect"] == asp, text


def test_aspect_four_way_lockstep(ray_session):
    """Arrow kernel, Python oracle and DuckDB SQL mirror agree on
    (is_past, aspect) for every cell — one conversation holding all the
    cases plus pronoun-template aspect forms and a quoted construct."""
    rows = _turns([t for t, *_ in ASPECT_CASES] + [
        # pronoun templates with aspect forms (referent = Frank, the max
        # person of the latest earlier turn)
        "She is working at Globex Corp.",
        "He has used browser daily.",
        # a simple-aspect quoted construct (v29 adds quoted aspect
        # alternants; their lockstep lives in test_v29_grammar)
        'Grace said "Heidi uses compiler daily."'])
    o = _resolved(rows)
    r = _resolved_ray(rows)
    s = _resolved_sql(rows)
    assert r == o
    assert s == o
    # the scenario really exercises all three aspect values
    assert {a for (*_, a) in o} == {"simple", "progressive", "perfect"}


def test_pronoun_aspect_resolution():
    """Pronoun-template aspect forms resolve by the standard Stage-B rule
    and carry the sentence's aspect/tense attributes."""
    rows = _turns(["Alice works at Acme Corp.",
                   "She was working at Globex Corp.",
                   "She has used search daily."])
    o = {tuple(d[k] for k in _KEY) for d in oracle.extract_conversation(rows)}
    assert (1, "Alice", "works_at", "Globex Corp", True, "progressive") in o
    assert (2, "Alice", "uses", "search", False, "perfect") in o


def test_exttool_lockstep_on_aspect(ray_session):
    """The subprocess worker (4th implementation) emits identical events
    for the aspect cells — byte-compatible with the in-process kernel."""
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = _turns([t for t, *_ in ASPECT_CASES])
    tab = _table(rows)
    ds = ray.data.from_arrow(tab)
    ext = pa.concat_tables(
        [b for b in extract_events_external(ds)
         .iter_batches(batch_format="pyarrow") if b.num_rows]
    ).cast(X.S.EVENTS)
    inp = X.extract_events(tab)

    def key_set(t):
        return {tuple(r[c] for c in
                      ("turn_idx", "subj", "pred", "obj", "is_past",
                       "aspect"))
                for r in t.to_pylist()}
    assert key_set(ext) == key_set(inp)


def test_aspect_never_leaks_to_unalternated_templates():
    """Templates outside the four alternating families never match an
    aspect-form sentence (no accidental partial matches), and their
    sentences always classify simple."""
    # 'is working at both' — coord_orgs anchors ' works at both '
    out = oracle.extract_conversation(
        _turns(["Ivan is working at both Acme Corp and Globex Corp."]))
    assert out == []
    # intrinsically-past verbs stay simple
    out = oracle.extract_conversation(_turns(["Judy joined Acme Corp."]))
    assert out[0]["aspect"] == "simple" and out[0]["is_past"] is True


def test_synth_corpus_carries_all_aspects():
    """The v27 corpus generates real positives for every aspect value in
    the alternating families, and GT alignment (P/R) is preserved —
    asserted corpus-wide in test_kg_pipeline; here: presence."""
    rows, _gts = synth.generate_corpus(160)
    o = oracle.extract_all(rows.to_pylist())
    seen = {d["aspect"] for d in o}
    assert seen == {"simple", "progressive", "perfect"}
    # present perfect exists and is non-past (the carve-out, end to end)
    assert any(d["aspect"] == "perfect" and not d["is_past"] for d in o)
    assert any(d["aspect"] == "perfect" and d["is_past"] for d in o)
    assert any(d["aspect"] == "progressive" and d["is_past"] for d in o)
