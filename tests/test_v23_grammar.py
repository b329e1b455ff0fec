"""v23 construct semantics: MULTI-SENTENCE quoted speech + the
quote-aware sentence splitter (parity repair).

Pins the CONTRACT cases individually: the splitter's quote-parity repair
(four-way: Python reference / Arrow kernel / DuckDB SQL mirror agree on
adversarial quote layouts), both inner emissions with clause 'quoted',
intra-quote anaphora resolving in the QUOTING turn's scope (never the
first inner sentence's subject), the quoted maintains feeding the
module-keyed descriptor state, pronoun-resolved maintains feeding none,
and anchor disjointness from quoted_uses / plain maintains.  The
corpus-wide lockstep lives in test_extract.py / test_synth_oracle.py /
test_external_tool.py.
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


def _resolved(rows):
    return {(d["turn_idx"], d["subj"], d["pred"], d["obj"], d["slot_idx"],
             d["clause"]) for d in oracle.extract_conversation(rows)}


def _resolved_ray(rows, ray_session):
    import ray
    out = X.extract_triples(ray.data.from_arrow(_table(rows)))
    return {(d["turn_idx"], d["subj"], d["pred"], d["obj"], d["slot_idx"],
             d["clause"])
            for b in out.iter_batches(batch_format="pyarrow")
            for d in b.to_pylist()}


def _resolved_sql(rows):
    con = duckdb.connect()
    con.register("transcripts_t", _table(rows))
    sql = sqlgen.resolved_triples_sql("transcripts_t")
    out = con.sql(f"SELECT turn_idx, subj, pred, obj, slot_idx, clause "
                  f"FROM ({sql})").fetchall()
    con.close()
    return set(out)


# ---------------------------------------------------------------------------
# splitter: the quote-parity repair contract (rules.split_sentences is the
# reference; the Arrow kernel and the SQL CTE implement it independently)
# ---------------------------------------------------------------------------

_SPLIT_CASES = [
    "Alice works at Acme. Bob uses vim daily.",
    'Carol said "Alice uses vim daily. She maintains auth.core."',
    'Filler first. Carol said "Alice uses vim daily. Bob maintains x.y."',
    '"Bob uses vim daily," said Alice. Carol works at Acme.',
    'Zoe said "Alice introduced Bob to Carol."',
    "No boundary here",
    'Eve said "X uses vim daily. He maintains a.b." Trailing? Yes.',
    "Is this real? It is. Done!",
]


def test_split_sentences_reference_semantics():
    assert R.split_sentences(_SPLIT_CASES[1]) == [_SPLIT_CASES[1]]
    assert R.split_sentences(_SPLIT_CASES[0]) == [
        "Alice works at Acme.", "Bob uses vim daily."]
    assert R.split_sentences(_SPLIT_CASES[2]) == [
        "Filler first.",
        'Carol said "Alice uses vim daily. Bob maintains x.y."']
    # '." ' is not a boundary (quote between punctuation and space), so
    # the whole quoted turn up to the next real boundary stays together
    assert R.split_sentences(_SPLIT_CASES[6]) == [
        'Eve said "X uses vim daily. He maintains a.b." Trailing?', "Yes."]


def test_splitter_arrow_kernel_matches_reference():
    tbl = pa.table({
        "conv_id": [f"c{i}" for i in range(len(_SPLIT_CASES))],
        "turn_idx": pa.array([0] * len(_SPLIT_CASES), pa.int32()),
        "text": _SPLIT_CASES,
    })
    out = X._explode_sentences(tbl)
    got: dict[str, list] = {}
    for r in out.to_pylist():
        got.setdefault(r["conv_id"], []).append((r["sent_idx"], r["sent"]))
    for i, c in enumerate(_SPLIT_CASES):
        assert sorted(got[f"c{i}"]) == list(
            enumerate(R.split_sentences(c))), c


def test_splitter_sql_mirror_matches_reference():
    tbl = pa.table({
        "conv_id": [f"c{i}" for i in range(len(_SPLIT_CASES))],
        "turn_idx": pa.array([0] * len(_SPLIT_CASES), pa.int32()),
        "text": _SPLIT_CASES,
    })
    con = duckdb.connect()
    con.register("transcripts_t", tbl)
    rows = con.sql(
        f"SELECT conv_id, sent_idx, sent "
        f"FROM {sqlgen._sents_cte('transcripts_t')}").fetchall()
    con.close()
    got: dict[str, list] = {}
    for cid, si, s in rows:
        got.setdefault(cid, []).append((si, s))
    for i, c in enumerate(_SPLIT_CASES):
        assert sorted(got[f"c{i}"]) == list(
            enumerate(R.split_sentences(c))), c


# ---------------------------------------------------------------------------
# construct semantics
# ---------------------------------------------------------------------------

def test_quoted_multi_both_emissions(ray_session):
    rows = _turns(['Zoe said "Alice uses vim daily. Bob maintains x.y."'])
    got = _resolved(rows)
    assert (0, "Alice", "uses", "vim", 0, "quoted") in got
    assert (0, "Bob", "maintains", "x.y", 0, "quoted") in got
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_quoted_multi_intra_quote_pronoun_quoting_scope(ray_session):
    """'She' in the SECOND inner sentence resolves in the QUOTING turn's
    scope — the committed referent of turn 0 (Erin), NOT the first inner
    sentence's subject (Alice): same-turn state is never visible."""
    rows = _turns(["Dave met with Erin.",
                   'Zoe said "Alice uses vim daily. She maintains x.y."'])
    got = _resolved(rows)
    assert (1, "Erin", "maintains", "x.y", 0, "quoted") in got
    assert not any(s == "Alice" and p == "maintains"
                   for (_t, s, p, *_r) in got)
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_quoted_multi_maintains_feeds_descriptor_state(ray_session):
    """The EXPLICIT maintains subject inside the quote commits the
    module-keyed descriptor state (state selection by predicate): a later
    definite description resolves through it."""
    rows = _turns(['Zoe said "Alice uses vim daily. Bob maintains x.y."',
                   "The maintainer of x.y met with Grace."])
    got = _resolved(rows)
    assert (1, "Bob", "met", "Grace", 0, "definite") in got
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_quoted_multi_pronoun_maintains_feeds_no_descriptor_state(
        ray_session):
    """A pronoun-RESOLVED maintains row never feeds maintainer state: the
    later descriptor stays unresolved (no triple)."""
    rows = _turns(["Dave met with Erin.",
                   'Zoe said "Alice uses vim daily. She maintains x.y."',
                   "The maintainer of x.y met with Grace."])
    got = _resolved(rows)
    assert not any(t == 2 for (t, *_r) in got)
    assert got == _resolved_ray(rows, ray_session)


def test_quoted_multi_referent_commit_is_max_inner_subject(ray_session):
    """Both explicit inner subjects feed referent state; speaker (Zoe,
    lexicographic max in the turn) never does — the turn referent is
    max(Alice, Bob) = Bob."""
    rows = _turns(['Zoe said "Alice uses vim daily. Bob maintains x.y."',
                   "He works at Initech."])
    got = _resolved(rows)
    assert (1, "Bob", "works_at", "Initech", 0, "main") in got
    assert not any(s == "Zoe" for (_t, s, *_r) in got)
    assert got == _resolved_ray(rows, ray_session)


def test_quoted_multi_disjoint_from_single_quoted_and_plain(ray_session):
    """quoted_uses still owns the single-sentence quote; the plain
    maintains template still owns the unquoted sentence; neither matches
    the multi-sentence quote's pieces twice."""
    rows = _turns(['Zoe said "Alice uses vim daily."',
                   "Bob maintains x.y.",
                   'Zoe said "Alice uses vim daily. Bob maintains x.y."'])
    got = _resolved(rows)
    assert (0, "Alice", "uses", "vim", 0, "quoted") in got
    assert (1, "Bob", "maintains", "x.y", 0, "main") in got
    two = [g for g in got if g[0] == 2]
    assert len(two) == 2
    assert got == _resolved_ray(rows, ray_session)
    assert got == _resolved_sql(rows)


def test_quoted_multi_sent_idx_is_outer_ordinal(ray_session):
    """With a filler sentence before the quote, both emissions carry the
    OUTER sentence ordinal 1 (the inner boundary is not a sentence
    boundary)."""
    import ray
    rows = _turns(
        ['Filler first. Zoe said "Alice uses vim daily. Bob maintains '
         'x.y."'])
    ev = X.extract_events(_table(rows))
    si = {(d["pred"], d["sent_idx"]) for d in ev.to_pylist()}
    assert ("uses", 1) in si and ("maintains", 1) in si
