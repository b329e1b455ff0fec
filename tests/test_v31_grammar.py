"""v31 construct semantics: ASPECT over the PASSIVE — the passive
auxiliary chain alternates simple ('is/was maintained by'), progressive
('is/was being maintained by') and perfect ('has/had been maintained
by').  Kernel changes (rules.py, shared by all four implementations):
PRES_PASSIVE_RE admits an optional 'being ' (present progressive
passive stays non-past), PRES_PERFECT_RE gains the 'been' participle
(present perfect passive stays non-past, like 'has worked'), and
'being'/'been' join PROG_RE/PERF_RE.  Tense composes independently:

    is maintained        -> simple,      non-past
    was maintained       -> simple,      past  ('was')
    is being maintained  -> progressive, non-past (carve-out)
    was being maintained -> progressive, past  ('was')
    has been maintained  -> perfect,     non-past (carve-out)
    had been maintained  -> perfect,     past  ('maintained')
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


V31_CASES = [
    # (text, (subj, obj), is_past, aspect) — one maintains emission each,
    # clause 'passive', slot_idx 0
    ("auth.core is maintained by Alice.",
     ("Alice", "auth.core"), False, "simple"),
    ("auth.core was maintained by Bob.",
     ("Bob", "auth.core"), True, "simple"),
    ("net.http is being maintained by Carol.",
     ("Carol", "net.http"), False, "progressive"),
    ("net.http was being maintained by Dave.",
     ("Dave", "net.http"), True, "progressive"),
    ("db.index has been maintained by Erin.",
     ("Erin", "db.index"), False, "perfect"),
    ("db.index had been maintained by Frank.",
     ("Frank", "db.index"), True, "perfect"),
]


def test_v31_contract_per_cell():
    for text, (subj, obj), past, asp in V31_CASES:
        out = oracle.extract_conversation(_turns([text]))
        got = {tuple(d[k] for k in _KEY) for d in out}
        assert got == {(0, subj, "maintains", obj, 0, "passive",
                        past, asp)}, text


def test_v31_active_families_unchanged():
    """The two carve-out extensions are strictly additive: no active
    family's tense/aspect classification moves (the v31 litmus — the
    new alternatives only ever match 'being'/'been' chains, which no
    other construct can produce)."""
    cases = [
        ("Alice has worked at Acme Corp.", False, "perfect"),
        ("Alice had worked at Acme Corp.", True, "perfect"),
        ("Alice is working at Acme Corp.", False, "progressive"),
        ("Alice worked at Acme Corp.", True, "simple"),
        ("Alice and Bob have met.", False, "perfect"),
        ("Carol is using vim daily.", False, "progressive"),
    ]
    for text, past, asp in cases:
        out = oracle.extract_conversation(_turns([text]))
        assert len(out) >= 1, text
        assert all(d["is_past"] == past and d["aspect"] == asp
                   for d in out), text


def test_v31_four_way_lockstep(ray_session):
    rows = _turns([t for t, *_ in V31_CASES] + [
        # a later definite description resolving through a perfect-
        # passive-committed maintainer (state selection is by predicate,
        # not surface form — the v12 discipline)
        "The maintainer of db.index met with Grace.",
    ])
    o = _resolved(rows)
    r = _resolved_ray(rows)
    s = _resolved_sql(rows)
    assert r == o
    assert s == o
    assert {a for (*_, a) in o} >= {"simple", "progressive", "perfect"}


def test_v31_exttool_lockstep(ray_session):
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = _turns([t for t, *_ in V31_CASES])
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


def test_v31_descriptor_state_rides_passive_aspect():
    """An aspect-form passive maintains still commits the module-keyed
    descriptor state (explicit person subject), and the committed
    maintainer wins over an EARLIER explicit active maintains."""
    rows = _turns(["Alice maintains fs.cache.",
                   "fs.cache has been maintained by Bob.",
                   "The maintainer of fs.cache met with Carol."])
    o = {(d["turn_idx"], d["subj"], d["pred"], d["obj"])
         for d in oracle.extract_conversation(rows)}
    assert (2, "Bob", "met", "Carol") in o
    assert (2, "Alice", "met", "Carol") not in o


def test_v31_synth_corpus_carries_new_cells():
    rows, _gts = synth.generate_corpus(2500)
    o = oracle.extract_all(rows.to_pylist())
    cells = {(d["pred"], d.get("clause"), d.get("is_past"),
              d.get("aspect"))
             for d in o if d.get("clause") == "passive"}
    assert ("maintains", "passive", False, "progressive") in cells
    assert ("maintains", "passive", True, "progressive") in cells
    assert ("maintains", "passive", False, "perfect") in cells
    assert ("maintains", "passive", True, "perfect") in cells
    assert ("maintains", "passive", False, "simple") in cells
    assert ("maintains", "passive", True, "simple") in cells
