"""v38 construct semantics: ORG-PRONOUN anaphora — "It acquired Globex
Inc." / "It partnered with Stark Corp." — the engine's first NON-PERSON
pronoun class.

Contract (rules.py):

  * templates: 'It' + the acquired/partnered verb groups (with their
    v35 aspect alternations and SINCE_OPT); the explicit OBJECT is an
    org surface;
  * state: every FULLY-EXPLICIT event row (subj AND obj present)
    carrying an org-kind slot commits its org SURFACE to the org
    referent state at its turn — the object slot shadows the subject
    slot (both-org rows like acquired commit the OBJECT), and within a
    turn the LEXICOGRAPHICALLY GREATEST surface wins (the person-state
    tie-break discipline).  Pronoun- or descriptor-RESOLVED rows feed
    no org state (the resolved-row discipline) — including the
    org-pronoun row's own explicit object;
  * resolution: the referent is the committed org surface of the
    LATEST strictly-earlier turn (the standard rule); no committed org
    ⇒ no emission.  The resolved row's SUBJECT is the referent org
    surface with subj_kind='org', clause='org_pronoun';
  * implementation note: the state rides the generic descriptor-state
    machinery under the reserved key rules.ORG_REF_KEY ('\\x02org' — a
    control-character prefix no template capture can produce), so all
    four implementations reuse the module/manager/org-engineer state
    path verbatim.

Reference precedent: scope-crossing reference resolution in
``XImportResolverPass`` / ``XTypeRecovery`` — here lifted to a second
referent KIND alongside the person stream.
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


_KEY = ("turn_idx", "subj", "pred", "obj", "subj_kind", "obj_kind",
        "clause", "is_past", "aspect", "since_year")


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


def test_v38_basic_resolution():
    """The org referent of 'It' is the latest strictly-earlier turn's
    committed org surface; the resolved subject carries subj_kind='org'
    and clause='org_pronoun'."""
    rows = _turns(["Alice works at Acme Corp.",
                   "It acquired Globex Inc."])
    out = [d for d in oracle.extract_conversation(rows)
           if d["turn_idx"] == 1]
    assert [(d["subj"], d["pred"], d["obj"], d["subj_kind"],
             d["clause"]) for d in out] == \
        [("Acme Corp", "acquired", "Globex Inc", "org", "org_pronoun")]


def test_v38_object_shadows_subject_and_turn_max():
    """A both-org turn (acquired) commits its OBJECT org; duplicate org
    slots within a turn resolve by lexicographic max."""
    rows = _turns(["Stark Labs acquired Wayne Corp.",
                   "It partnered with Hooli Inc."])
    out = [d for d in oracle.extract_conversation(rows)
           if d["turn_idx"] == 1]
    # object (Wayne Corp) shadows subject (Stark Labs)
    assert [(d["subj"], d["pred"], d["obj"]) for d in out] == \
        [("Wayne Corp", "partnered", "Hooli Inc")]


def test_v38_resolved_rows_feed_no_org_state():
    """The org-pronoun row's explicit OBJECT does not commit org state:
    a second 'It' turn still refers to the original committed org (the
    co-reference contract)."""
    rows = _turns(["Alice works at Acme Corp.",
                   "It acquired Globex Inc.",
                   "It partnered with Stark Labs."])
    out = {(d["turn_idx"], d["subj"], d["pred"], d["obj"])
           for d in oracle.extract_conversation(rows)
           if d["clause"] == "org_pronoun"}
    assert (1, "Acme Corp", "acquired", "Globex Inc") in out
    assert (2, "Acme Corp", "partnered", "Stark Labs") in out


def test_v38_no_committed_org_no_emission():
    """'It' with no strictly-earlier org-bearing turn emits nothing, and
    person-only turns commit no org state."""
    out = oracle.extract_conversation(
        _turns(["It acquired Globex Inc."]))
    assert out == []
    out = oracle.extract_conversation(
        _turns(["Alice met with Bob.", "It acquired Globex Inc."]))
    assert not any(d["clause"] == "org_pronoun" for d in out)


def test_v38_aspect_and_since_compose():
    """The v35 aspect alternation and the v33 adjunct ride the
    org-pronoun templates."""
    rows = _turns(["Alice works at Acme Corp.",
                   "It has partnered with Stark Labs since 2018.",
                   "It is acquiring Globex Inc."])
    out = {(d["turn_idx"], d["pred"], d["is_past"], d["aspect"],
            d["since_year"])
           for d in oracle.extract_conversation(rows)
           if d["clause"] == "org_pronoun"}
    assert (1, "partnered", False, "perfect", 2018) in out
    assert (2, "acquired", False, "progressive", None) in out


def test_v38_person_state_untouched():
    """Org-pronoun turns do not disturb the person referent stream: a
    later 'She' still resolves through the last person-bearing turn."""
    rows = _turns(["Alice works at Acme Corp.",
                   "It acquired Globex Inc.",
                   "She uses vim daily."])
    out = {(d["turn_idx"], d["subj"], d["pred"], d["obj"])
           for d in oracle.extract_conversation(rows)}
    assert (2, "Alice", "uses", "vim") in out


def test_v38_four_way_lockstep(ray_session):
    """Arrow kernel, Python oracle and DuckDB SQL mirror agree
    row-for-row on one conversation exercising every v38 rule."""
    rows = _turns(["Alice works at Acme Corp.",
                   "It acquired Globex Inc.",
                   "Stark Labs acquired Wayne Corp.",
                   "It has partnered with Hooli Inc since 2015.",
                   "It is acquiring Initech Labs.",
                   "Bob joined Tyrell Corp.",
                   "It partnered with Umbrella Labs.",
                   "It acquired Cyberdyne Inc."])
    o = _resolved(rows)
    assert _resolved_ray(rows) == o
    assert _resolved_sql(rows) == o
    assert sum(1 for r in o if r[6] == "org_pronoun") >= 4


def test_v38_exttool_lockstep(ray_session):
    """The subprocess worker (4th implementation) emits identical
    events."""
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = _turns(["Alice works at Acme Corp.",
                   "It acquired Globex Inc.",
                   "It has partnered with Hooli Inc since 2015."])
    tab = _table(rows)
    ds = ray.data.from_arrow(tab)
    ext = pa.concat_tables(
        [b for b in extract_events_external(ds)
         .iter_batches(batch_format="pyarrow") if b.num_rows]
    ).cast(X.S.EVENTS)
    inp = X.extract_events(tab)

    def key_set(t):
        return {tuple(r[c] for c in
                      ("turn_idx", "subj", "pred", "obj", "subj_kind",
                       "obj_kind", "clause", "desc_key", "since_year"))
                for r in t.to_pylist()}
    assert key_set(ext) == key_set(inp)


def test_v38_synth_corpus_carries_org_pronouns(ray_session):
    """The v38 corpus generates resolvable org-pronoun turns whose GT
    agrees with the oracle (presence; corpus-wide P/R in
    test_kg_pipeline)."""
    rows, gts = synth.generate_corpus(600)
    o = oracle.extract_all(rows.to_pylist())
    got = {(d["pred"], d.get("clause")) for d in o}
    assert ("acquired", "org_pronoun") in got
    assert ("partnered", "org_pronoun") in got
