"""v30 construct semantics: PLURAL coordination aspect — the coord /
coord3 / coordN-list / quoted-coord verb groups alternate progressive
('are/were working') and perfect ('have/had worked') alongside the v24
present/past pair.  Pure template + synth change: the plural
are/were/have auxiliaries entered PROG_RE / PAST_RE / PRES_PERFECT_RE
with the v29 reciprocal, so the sentence-level lexical kernels needed
no edits (the v30 litmus: every assertion here holds against the same
four shared kernel constants v29 shipped).
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


V30_CASES = [
    # (text, [(pred, subj, obj, slot_idx, clause)], is_past, aspect)
    ("Alice and Bob are working at Acme Corp.",
     [("works_at", "Alice", "Acme Corp", 0, "main"),
      ("works_at", "Bob", "Acme Corp", 1, "main")],
     False, "progressive"),
    ("Alice and Bob were working at Acme Corp.",
     [("works_at", "Alice", "Acme Corp", 0, "main"),
      ("works_at", "Bob", "Acme Corp", 1, "main")],
     True, "progressive"),
    ("Alice and Bob have worked at Acme Corp.",
     [("works_at", "Alice", "Acme Corp", 0, "main"),
      ("works_at", "Bob", "Acme Corp", 1, "main")],
     False, "perfect"),
    ("Alice and Bob had worked at Acme Corp.",
     [("works_at", "Alice", "Acme Corp", 0, "main"),
      ("works_at", "Bob", "Acme Corp", 1, "main")],
     True, "perfect"),
    ("Carol and Dave are using vim daily.",
     [("uses", "Carol", "vim", 0, "main"),
      ("uses", "Dave", "vim", 1, "main")],
     False, "progressive"),
    ("Carol and Dave had used vim daily.",
     [("uses", "Carol", "vim", 0, "main"),
      ("uses", "Dave", "vim", 1, "main")],
     True, "perfect"),
    ("Alice, Bob and Carol were working at Globex Corp.",
     [("works_at", "Alice", "Globex Corp", 0, "main"),
      ("works_at", "Bob", "Globex Corp", 1, "main"),
      ("works_at", "Carol", "Globex Corp", 2, "main")],
     True, "progressive"),
    ('Erin said "Frank and Grace have used search daily."',
     [("uses", "Frank", "search", 0, "quoted"),
      ("uses", "Grace", "search", 1, "quoted")],
     False, "perfect"),
]


def test_v30_contract_per_cell():
    for text, emis, past, asp in V30_CASES:
        out = oracle.extract_conversation(_turns([text]))
        got = {tuple(d[k] for k in _KEY) for d in out}
        want = {(0, s, p, o, sl, cl, past, asp) for p, s, o, sl, cl in emis}
        assert got == want, text


def test_v30_list_template_aspect():
    """The open-ended list construct (4+ members) carries the aspect
    attribute on every member emission, slot_idx preserved."""
    out = oracle.extract_conversation(_turns(
        ["Alice, Bob, Carol, Dave and Erin are working at Acme Corp."]))
    got = {(d["subj"], d["slot_idx"], d["is_past"], d["aspect"])
           for d in out}
    assert got == {("Alice", 0, False, "progressive"),
                   ("Bob", 1, False, "progressive"),
                   ("Carol", 2, False, "progressive"),
                   ("Dave", 3, False, "progressive"),
                   ("Erin", 4, False, "progressive")}


def test_v30_four_way_lockstep(ray_session):
    rows = _turns([t for t, *_ in V30_CASES] + [
        "Alice, Bob, Carol, Dave and Erin have worked at Initech Corp.",
        # pronoun member under a plural aspect group: 'She' resolves,
        # the explicit member commits (standard v21 slot contract)
        "She and Zed are using browser daily."])
    o = _resolved(rows)
    r = _resolved_ray(rows)
    s = _resolved_sql(rows)
    assert r == o
    assert s == o
    assert {a for (*_, a) in o} >= {"progressive", "perfect"}


def test_v30_exttool_lockstep(ray_session):
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = _turns([t for t, *_ in V30_CASES])
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


def test_v30_org_state_rides_aspect_forms():
    """A plural-aspect works_at still commits the v28 org-keyed
    descriptor state for BOTH members' shared org (state selection is by
    predicate, not surface form)."""
    rows = _turns(["Alice and Bob have worked at Acme Corp.",
                   "The Acme engineer met with Carol."])
    o = {(d["turn_idx"], d["subj"], d["pred"], d["obj"])
         for d in oracle.extract_conversation(rows)}
    # the committed engineer is max(Alice, Bob) = Bob
    assert (1, "Bob", "met", "Carol") in o


def test_v30_synth_corpus_carries_new_cells():
    # 1500 convs: the rarest cell (coord_uses × progressive, ~7% of a
    # ~1% turn class) needs a larger draw after the v35 aspect branches
    # shifted the per-conversation RNG stream
    rows, _gts = synth.generate_corpus(1500)
    o = oracle.extract_all(rows.to_pylist())
    cells = {(d["pred"], d.get("clause"), d.get("aspect"),
              d.get("slot_idx")) for d in o}
    # coordination slot-1 emissions under both new aspect values
    assert any(c[:3] == ("works_at", "main", "progressive") and c[3] == 1
               for c in cells)
    assert any(c[:3] == ("works_at", "main", "perfect") and c[3] == 1
               for c in cells)
    assert any(c[:3] == ("uses", "main", "progressive") and c[3] == 1
               for c in cells)
