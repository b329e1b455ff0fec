"""v26 construct semantics: pronoun CHAINS across multi-sentence quoted
speech.

Contract (rules.py, quoted_multi_uses_maintains): EITHER inner subject
slot — or BOTH — may be a pronoun; each resolves INDEPENDENTLY in the
QUOTING turn's scope (the committed referent of the latest
strictly-earlier turn; no intra-quote binding, even to an explicit first
inner subject).  Resolved rows commit nothing; an explicit inner subject
commits referent (and, for maintains, descriptor) state.

Reference precedent: nested scopes in the per-language AstCreators
(``pysrc2cpg/PythonAstVisitor.scala``) resolve names against enclosing
scopes, never sibling statements of the same nesting level.
"""

import pyarrow as pa

from joern_ray import synth
from joern_ray.extract import oracle
from joern_ray.stages import extract as X


def _turns(texts, conv="convA"):
    return [dict(conv_id=conv, turn_idx=i, role="user", text=t,
                 tool=None, ts=None) for i, t in enumerate(texts)]


def _table(rows):
    t, _ = synth.generate_corpus(1)  # borrow the authoritative schema
    cols = {name: [r.get(name) for r in rows] for name in t.schema.names}
    return pa.Table.from_pydict(cols, schema=t.schema)


def _resolved(rows):
    return {(d["turn_idx"], d["subj"], d["pred"], d["obj"], d["clause"])
            for d in oracle.extract_conversation(rows)}


CHAIN = ["Alice works at Acme Corp.",
         'Bob said "She uses search daily. He maintains auth.core."']


def test_chain_both_pronouns_coref():
    """Both intra-quote pronouns resolve to the SAME committed referent
    of the latest strictly-earlier turn — not to each other."""
    res = _resolved(_turns(CHAIN))
    assert (1, "Alice", "uses", "search", "quoted") in res
    assert (1, "Alice", "maintains", "auth.core", "quoted") in res
    # the speaker is not an emitted slot
    assert not any(s == "Bob" for (_, s, *_rest) in res)


def test_chain_commits_nothing():
    """A chain turn has no explicit person slot: the referent carries
    over unchanged, and the pronoun-RESOLVED maintains row feeds no
    module-keyed descriptor state."""
    res = _resolved(_turns(CHAIN + [
        "She uses browser daily.",
        "The maintainer of auth.core met with Carol."]))
    # referent at t2 is still Alice (t1 committed nothing)
    assert (2, "Alice", "uses", "browser", "main") in res
    # descriptor at t3 is unresolvable (no committed maintainer) — no met
    assert not any(p == "met" for (_, _, p, *_rest) in res)


def test_pronoun_first_explicit_second_commits():
    """Pronoun in the FIRST inner slot: it still resolves in the quoting
    turn's scope, and the EXPLICIT second subject commits both referent
    state and the module-keyed maintainer state."""
    rows = _turns(["Alice works at Acme Corp.",
                   'Bob said "She uses search daily. '
                   'Dave maintains auth.core."',
                   "She works at Globex Corp.",
                   "The maintainer of auth.core met with Carol."])
    res = _resolved(rows)
    assert (1, "Alice", "uses", "search", "quoted") in res
    assert (1, "Dave", "maintains", "auth.core", "quoted") in res
    # Dave committed the referent at t1
    assert (2, "Dave", "works_at", "Globex Corp", "main") in res
    # ...and the maintainer state
    assert (3, "Dave", "met", "Carol", "definite") in res


def test_chain_kernel_oracle_lockstep(ray_session):
    """Arrow kernel and Python oracle agree on the chain constructs —
    including the pronoun-first/EXPLICIT-second variant, whose explicit
    quoted ``maintains`` subject feeds module-keyed descriptor state and
    referent state through the kernel's Stage-B path (ADVICE r4: this
    path was previously asserted via the Python oracle only)."""
    import ray
    rows = _turns(CHAIN + [
        'Erin said "He uses compiler daily. She maintains db.index."',
        "The maintainer of db.index joined Initech Labs.",
        "She works at Globex Corp.",
        # pronoun-first / explicit-second: Dave commits referent AND
        # module-keyed maintainer state from INSIDE the quote
        'Frank said "She uses linker daily. Dave maintains net.proxy."',
        # the referent committed by the explicit quoted subject...
        "He works at Hooli Inc.",
        # ...and a later definite description resolving through the
        # quoted-committed maintainer state
        "The maintainer of net.proxy met with Carol."])
    expected = _resolved(rows)
    # the scenario itself must exercise the Stage-B commits in question
    assert (6, "Dave", "works_at", "Hooli Inc", "main") in expected
    assert any(s == "Dave" and p == "met" and o == "Carol"
               for (_, s, p, o, _c) in expected)
    out = X.extract_triples(ray.data.from_arrow(_table(rows)))
    got = {(d["turn_idx"], d["subj"], d["pred"], d["obj"], d["clause"])
           for b in out.iter_batches(batch_format="pyarrow")
           for d in b.to_pylist()}
    assert got == expected
