"""v32 construct semantics: PLURAL-PRONOUN anaphora — "They ..." resolves
to the FULL committed person set of the anchor turn (the latest strictly-
earlier person-bearing turn), one triple per DISTINCT member, slot_idx =
lexicographic rank, clause 'plural'.  The singular referent is max(set),
so both rules read the same state stream; plural-RESOLVED rows feed no
state, so consecutive plural turns co-refer to the same set.  "They"
joins SUBJ_PRONOUNS, so a plural pronoun captured by any non-plural
template's person-subject slot stays a pronoun surface (dropped or
singular-resolved per that template's standard rule).

The verb groups are the v30 plural aspect alternations, so the attribute
kernels needed zero edits — 'They are working' is progressive, 'They
have worked' perfect non-past, 'They worked' simple past.
"""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc

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


BASE = [
    "Alice and Bob work at Acme Corp.",       # t0: set {Alice, Bob}
    "They use vim daily.",                    # t1: expand, slots by rank
    "They are working at Globex Corp.",       # t2: CHAIN — same set
    "Carol reported a bug in auth.core.",     # t3: set {Carol}
    "They have worked at Initech Corp.",      # t4: singleton expansion
]


def test_v32_contract_expansion_and_chain():
    o = oracle.extract_conversation(_turns(BASE))
    got = {tuple(d[k] for k in _KEY) for d in o}
    assert (1, "Alice", "uses", "vim", 0, "plural",
            False, "simple") in got
    assert (1, "Bob", "uses", "vim", 1, "plural",
            False, "simple") in got
    # chain: t1's resolved rows fed no state, so t2 expands the SAME set
    assert (2, "Alice", "works_at", "Globex Corp", 0, "plural",
            False, "progressive") in got
    assert (2, "Bob", "works_at", "Globex Corp", 1, "plural",
            False, "progressive") in got
    # singleton set expands to one triple at slot 0, perfect non-past
    assert (4, "Carol", "works_at", "Initech Corp", 0, "plural",
            False, "perfect") in got
    assert sum(1 for g in got if g[0] == 4) == 1


def test_v32_no_anchor_emits_nothing():
    o = oracle.extract_conversation(_turns(["They use search daily."]))
    assert o == []


def test_v32_slot_rank_is_lexicographic_not_surface_order():
    # the coordination lists Dave before Bob; ranks are set-derived
    o = oracle.extract_conversation(_turns([
        "Dave and Bob work at Acme Corp.",
        "They use vim daily."]))
    got = {(d["subj"], d["slot_idx"]) for d in o if d["turn_idx"] == 1}
    assert got == {("Bob", 0), ("Dave", 1)}


def test_v32_set_replaced_not_unioned():
    # a later person-bearing turn REPLACES the committed set
    o = oracle.extract_conversation(_turns([
        "Alice and Bob work at Acme Corp.",
        "Carol met with Dave.",               # contributes {Dave} (obj
                                              # shadows subj per row)
        "They use vim daily."]))
    got = {(d["subj"], d["slot_idx"]) for d in o if d["turn_idx"] == 2}
    assert got == {("Dave", 0)}


def test_v32_they_in_other_templates_is_pronoun_surface():
    # "They" captured by a non-plural person-subject slot is dropped
    # (no explicit triple with subj='They', no state contribution)
    o = oracle.extract_conversation(_turns([
        "Alice and Bob work at Acme Corp.",
        "They reported a bug in auth.core.",   # no plural template: drop
        "They use vim daily."]))               # anchor is still t0
    assert not any(d["subj"] == "They" for d in o)
    got = {(d["subj"], d["turn_idx"]) for d in o if d["turn_idx"] == 2}
    assert got == {("Alice", 2), ("Bob", 2)}


def test_v32_negation_and_question_ride_along():
    o = oracle.extract_conversation(_turns([
        "Alice and Bob work at Acme Corp.",
        "They no longer work at Hooli."]))
    rows = [d for d in o if d["turn_idx"] == 1]
    assert {d["subj"] for d in rows} == {"Alice", "Bob"}
    assert all(d["negated"] and d["clause"] == "plural" for d in rows)


def test_v32_four_way_lockstep(ray_session):
    rows = _turns(BASE + [
        "They no longer use browser daily.",
        # plural after a reciprocal: contributions are the per-row
        # OBJECTS, so the set is both participants
        "Erin and Frank met.",
        "They work at Stark Corp.",
    ])
    o = _resolved(rows)
    r = _resolved_ray(rows)
    s = _resolved_sql(rows)
    assert r == o
    assert s == o
    assert (7, "Erin", "works_at", "Stark Corp", 0, "plural",
            False, "simple") in o
    assert (7, "Frank", "works_at", "Stark Corp", 1, "plural",
            False, "simple") in o


def test_v32_bucket_paths_match_reference(ray_session):
    """Fast (numpy) and slow (pandas) bucket resolvers both implement
    the plural expansion — equivalence against _resolve_group."""
    rows = _turns(BASE, conv="cA") + _turns(
        ["They use search daily.",            # no anchor: drop
         "Dave joined Hooli Labs.",
         "They work at Stark Corp."], conv="cB")
    tab = _table(rows)
    ev = X.extract_events(tab)
    key = ("conv_id",) + _KEY
    ref = set()
    for cid in ("cA", "cB"):
        g = X._resolve_group(ev.filter(pc.equal(
            ev.column("conv_id").cast(pa.string()), cid)))
        ref |= {tuple(r[k] for k in key) for r in g.to_pylist()}
    nar = X._resolve_subset(ev, 4)
    fast, slow = [X._passthrough_triples(ev)], [X._passthrough_triples(ev)]
    for b in range(4):
        sub = nar.filter(pc.equal(nar.column("bucket"), b))
        if sub.num_rows:
            fast.append(X._resolve_bucket(sub))
            g = X._decode_narrow(
                sub.drop_columns(["bucket"])).combine_chunks()
            slow.append(X._resolve_bucket_slow(g, 100_000))
    for got in (fast, slow):
        s = {tuple(r[k] for k in key)
             for r in pa.concat_tables(got).to_pylist()}
        assert s == ref


def test_v32_exttool_lockstep(ray_session):
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = _turns(BASE)
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


def test_v32_synth_corpus_carries_plural_cells():
    rows, gts = synth.generate_corpus(400)
    o = oracle.extract_all(rows.to_pylist())
    plural = [d for d in o if d.get("clause") == "plural"]
    assert plural, "corpus must generate plural-pronoun turns"
    # multi-member expansion present (slot 1 exists)
    assert any(d["slot_idx"] >= 1 for d in plural)
    # both template families appear
    assert {d["pred"] for d in plural} >= {"works_at", "uses"}
    # synth GT and oracle agree on every plural turn (the atomic-pair
    # tracking can never disagree with the resolution contract)
    gtset = {(g["conv_id"], g["turn_idx"], g["subj"], g["pred"])
             for g in gts.to_pylist()}
    for d in plural:
        assert (d["conv_id"], d["turn_idx"], d["subj"].lower(),
                d["pred"]) in gtset
