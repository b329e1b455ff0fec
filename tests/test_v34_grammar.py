"""v34 construct semantics: the PLURAL RECIPROCAL — "They met." — the
first construct with QUADRATIC set expansion.

Contract (rules.py): both slots of the symmetric relation come from the
committed person set, so one event expands into one triple per ORDERED
PAIR of distinct anchor-set members (k members ⇒ k·(k-1) triples):

  * anchor turn: the v32 rule verbatim (one state stream serves the
    singular max-rule, the v32 linear set rule and this pair rule);
  * subj = a, obj = b for every a ≠ b; slot_idx = a's LEXICOGRAPHIC
    rank (the v21 reciprocal's subject-position discipline); clause
    'plural_recip';
  * a SINGLE-member set emits NOTHING (no partner — unlike v32, where
    one member still yields one triple); no anchor ⇒ nothing;
  * resolved rows feed NO state, so chained plural turns co-refer.

Event-store discriminator: subj NULL ∧ obj NULL ∧ desc_key NULL ∧
clause 'plural_recip' — the first event class with BOTH entity slots
unresolved.  Reference precedent: the pairwise closure a symmetric
relation induces over a coordinated definition site (recip_met lifted
to anaphora; the XTypeRecovery fan-out analogy of v32 squared).
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
    return sorted(tuple(d[k] for k in _KEY)
                  for d in oracle.extract_conversation(rows))


def _resolved_ray(rows):
    import ray
    out = X.extract_triples(ray.data.from_arrow(_table(rows)))
    return sorted(tuple(d[k] for k in _KEY)
                  for b in out.iter_batches(batch_format="pyarrow")
                  for d in b.to_pylist())


def _resolved_sql(rows):
    con = duckdb.connect()
    con.register("transcripts_t", _table(rows))
    sql = sqlgen.resolved_triples_sql("transcripts_t")
    out = con.sql("SELECT " + ", ".join(_KEY) + f" FROM ({sql})").fetchall()
    con.close()
    return sorted(out)


ROWS = [
    "Alice, Bob and Carol work at Acme Corp.",   # commits {A, B, C}
    "They met.",                                 # 6 ordered pairs
    "They have met.",                            # set carries over
    "Dave works at Globex Inc.",                 # commits {Dave}
    "They were meeting.",                        # k=1 -> nothing
]


def test_v34_pair_expansion_contract():
    """Oracle: 3 members ⇒ 6 ordered pairs with lexicographic subject
    ranks; chained plural turns co-refer; k=1 and no-anchor emit
    nothing; aspect/tense compose."""
    got = [k for k in _resolved(_turns(ROWS))
           if k[5] == R.PLURAL_RECIP_CLAUSE]
    want = sorted(
        [(1, a, "met", b, sl, "plural_recip", True, "simple")
         for a, b, sl in [("Alice", "Bob", 0), ("Alice", "Carol", 0),
                          ("Bob", "Alice", 1), ("Bob", "Carol", 1),
                          ("Carol", "Alice", 2), ("Carol", "Bob", 2)]]
        + [(2, a, "met", b, sl, "plural_recip", False, "perfect")
           for a, b, sl in [("Alice", "Bob", 0), ("Alice", "Carol", 0),
                            ("Bob", "Alice", 1), ("Bob", "Carol", 1),
                            ("Carol", "Alice", 2), ("Carol", "Bob", 2)]])
    assert got == want
    # no anchor at all ⇒ nothing
    assert _resolved(_turns(["They met."])) == []
    # 2-member set ⇒ exactly the two directions
    two = [k for k in _resolved(_turns(
        ["Erin and Frank work at Acme Corp.", "They had met."]))
        if k[5] == R.PLURAL_RECIP_CLAUSE]
    assert two == [(1, "Erin", "met", "Frank", 0, "plural_recip",
                    True, "perfect"),
                   (1, "Frank", "met", "Erin", 1, "plural_recip",
                    True, "perfect")]


def test_v34_four_way_lockstep(ray_session):
    """Arrow kernel (passthrough + vectorized bucket resolver), Python
    oracle and DuckDB SQL mirror agree row-for-row."""
    rows = _turns(ROWS)
    o = _resolved(rows)
    assert _resolved_ray(rows) == o
    assert _resolved_sql(rows) == o


def test_v34_exttool_lockstep(ray_session):
    """The subprocess worker emits the identical subj∧obj-null event
    class for the v34 sentences."""
    import ray

    from joern_ray.stages.external_tool import extract_events_external

    rows = _turns(ROWS)
    tab = _table(rows)
    ext = pa.concat_tables(
        [b for b in extract_events_external(ray.data.from_arrow(tab))
         .iter_batches(batch_format="pyarrow") if b.num_rows]
    ).cast(X.S.EVENTS)
    inp = X.extract_events(tab)

    def key_set(t):
        return sorted(tuple(r[c] for c in
                            ("turn_idx", "subj", "pred", "obj", "clause",
                             "is_past", "aspect"))
                      for r in t.to_pylist())
    assert key_set(ext) == key_set(inp)


def test_v34_slow_path_equivalence():
    """The pandas slow path (pathological-conversation divert) produces
    byte-identical pair expansions to the fast offset-arithmetic path."""
    ev = X.extract_events(_table(_turns(ROWS)))
    pt = X._passthrough_triples(ev).to_pylist()
    nar = X._resolve_subset(ev, 4)
    fast = X._resolve_bucket(nar, 100000).to_pylist()
    slow = X._resolve_bucket_slow(
        X._decode_narrow(nar.drop_columns(["bucket"])).combine_chunks(),
        100000).to_pylist()

    def ks(rows):
        return sorted(tuple(d[k] for k in _KEY) for d in rows)
    assert ks(pt + fast) == ks(pt + slow)


def test_v34_state_and_disjointness():
    """Pair-resolved rows feed no state (a later singular pronoun still
    resolves through the last EXPLICIT turn); 'They met.' leaks into no
    other template ('met with' and the explicit reciprocal are
    untouched)."""
    rows = _turns(["Grace and Heidi work at Acme Corp.",
                   "They met.",
                   "She has used vim daily."])
    o = {tuple(d[k] for k in ("turn_idx", "subj", "pred", "obj"))
         for d in oracle.extract_conversation(rows)}
    # referent = max committed person = Heidi (the pair rows committed
    # nothing at turn 1)
    assert (2, "Heidi", "uses", "vim") in o
    out = oracle.extract_conversation(_turns(["Alice met with Bob."]))
    assert [(d["pred"], d["clause"]) for d in out] == [("met", "main")]
    out = oracle.extract_conversation(_turns(["Alice and Bob met."]))
    assert {d["clause"] for d in out} == {"reciprocal"}


def test_v34_synth_corpus_carries_pairs():
    """The v34 corpus generates real plural-reciprocal positives, with
    both directions of every pair present and slot ranks consistent."""
    rows, gts = synth.generate_corpus(800)
    o = oracle.extract_all(rows.to_pylist())
    pairs = [d for d in o if d.get("clause") == R.PLURAL_RECIP_CLAUSE]
    assert len(pairs) > 20
    keys = {(d["conv_id"], d["turn_idx"], d["subj"], d["obj"])
            for d in pairs}
    # symmetric closure: every emitted (a, b) has its (b, a) partner
    assert all((c, t, b, a) in keys for (c, t, a, b) in keys)
    # GT parity: the generator wrote the same ordered pairs
    gt_pairs = {(g["conv_id"], g["turn_idx"], g["subj"], g["obj"])
                for g in gts.to_pylist() if g["pred"] == "met"}
    got_pairs = {(c, t, a.lower(), b.lower()) for (c, t, a, b) in keys}
    assert got_pairs <= gt_pairs
