"""Property-based tests (hypothesis) over the pure kernels — no Ray.

The reference has no randomized testing (SURVEY.md §5 item 7); we add it
where the engine has dual implementations that must stay in lockstep.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from joern_ray import schema as S
from joern_ray.functions import hashing as H
from joern_ray.functions import rules as R
from joern_ray.stages import extract as X
from joern_ray.stages.link import normalize_arrays

KINDS = ["person", "org", "tool", "module", "conv"]
surface = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
                           max_codepoint=0x2000),
    min_size=0, max_size=40)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(KINDS), surface),
                min_size=1, max_size=50))
def test_normalize_vectorized_matches_scalar(pairs):
    kinds = pa.array([k for k, _ in pairs])
    surf = pa.array([s for _, s in pairs])
    vec = normalize_arrays(kinds, surf).to_pylist()
    ref = [R.normalize_surface(k, s) for k, s in pairs]
    assert vec == ref


@settings(max_examples=100, deadline=None)
@given(st.sets(st.text(min_size=1, max_size=12), max_size=30),
       st.sets(st.text(min_size=1, max_size=12), max_size=30))
def test_jaccard_bounds_and_symmetry(a, b):
    j = R.jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == R.jaccard(b, a)
    assert R.jaccard(a, a) == 1.0


@settings(max_examples=50, deadline=None)
@given(st.sets(st.text(min_size=1, max_size=16), min_size=0, max_size=40))
def test_minhash_deterministic_and_identity(shingles):
    s1 = H.minhash_signature(shingles)
    s2 = H.minhash_signature(set(shingles))
    assert (s1 == s2).all()
    assert s1.dtype == np.uint64 and len(s1) == H.N_PERMS
    assert H.band_keys(s1) == H.band_keys(s2)


def _random_conversation_rows(draw):
    n = draw(st.integers(1, 20))
    conv = f"conv{draw(st.integers(0, 3)):03d}"
    rows = []
    for t in range(n):
        kind = draw(st.integers(0, 6))
        if kind == 0:
            p = draw(st.sampled_from(R.PERSONS[:6]))
            o = draw(st.sampled_from(R.ORG_BASES[:4]))
            text = f"{p} works at {o} Corp."
        elif kind == 1:
            pron = draw(st.sampled_from(["She", "He"]))
            tool = draw(st.sampled_from(R.TOOLS[:4]))
            text = f"{pron} uses {tool} daily."
        elif kind == 2:
            a = draw(st.sampled_from(R.PERSONS[:6]))
            b = draw(st.sampled_from(R.PERSONS[6:12]))
            text = f"{a} met with {b}."
        elif kind == 3:
            # definite-description state + descriptor (v12-v15): the
            # module-keyed commit and all five descriptor variants (plain
            # met, org-object, quoted-nested, tool-object, object-side),
            # mixed freely so buckets see descriptors with/without
            # resolvable state
            p = draw(st.sampled_from(R.PERSONS[:6]))
            mod = draw(st.sampled_from(R.MODULES[:3]))
            variant = draw(st.integers(0, 5))
            if variant == 0:
                text = f"{p} maintains {mod}."
            elif variant == 1:
                text = f"The maintainer of {mod} met with {p}."
            elif variant == 2:
                o = draw(st.sampled_from(R.ORG_BASES[:4]))
                text = f"The maintainer of {mod} joined {o} Corp."
            elif variant == 3:
                spk = draw(st.sampled_from(R.PERSONS[6:12]))
                text = (f'{spk} said "The maintainer of {mod} met with '
                        f'{p}."')
            elif variant == 4:
                tool = draw(st.sampled_from(R.TOOLS[:4]))
                text = f"The maintainer of {mod} uses {tool} daily."
            else:
                # OBJECT-side descriptor (v15): explicit subject, the
                # object resolves against the maintainer state
                verb = draw(st.sampled_from(["met with", "manages"]))
                text = f"{p} {verb} the maintainer of {mod}."
        elif kind == 4:
            # open-ended coordination list (v12), possibly with a pronoun
            # member at a random slot
            names = list(draw(st.permutations(R.PERSONS[:6])))[:4]
            if draw(st.booleans()):
                names[draw(st.integers(0, 3))] = \
                    draw(st.sampled_from(["She", "He"]))
            o = draw(st.sampled_from(R.ORG_BASES[:4]))
            text = (f"{names[0]}, {names[1]}, {names[2]} and {names[3]} "
                    f"work at {o} Corp.")
        else:
            text = "Nothing to extract here."
        rows.append(dict(conv_id=conv, turn_idx=t, role="user",
                         text=text, tool=None, ts=0))
    return rows


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_bucketed_resolution_matches_per_conversation(data):
    rows = []
    for _ in range(data.draw(st.integers(1, 4))):
        rows.extend(_random_conversation_rows(data.draw))
    # dedup (conv, turn) collisions across generated conversations
    seen, uniq = set(), []
    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        if k not in seen:
            seen.add(k)
            uniq.append(r)
    cols = {f.name: [r.get(f.name) for r in uniq] for f in S.TRANSCRIPTS}
    t = pa.Table.from_pydict(cols, schema=S.TRANSCRIPTS)
    events = X.extract_events(t)

    # reference path: per-conversation resolve over full events
    ref_parts = []
    for conv in sorted(set(events.column("conv_id").to_pylist())):
        import pyarrow.compute as pc
        g = events.filter(pc.equal(events.column("conv_id"), conv))
        ref_parts.append(X._resolve_group(g))
    ref = pa.concat_tables([p for p in ref_parts if p.num_rows] or
                           [S.TRIPLES_SURFACE.empty_table()])

    # bucketed path: passthrough + narrow resolve
    pt = X._passthrough_triples(events)
    sub = X._resolve_subset(events, 7)
    res_parts = []
    for b in sorted(set(sub.column("bucket").to_pylist())):
        import pyarrow.compute as pc
        g = sub.filter(pc.equal(sub.column("bucket"), b))
        res_parts.append(X._resolve_bucket(g))
    got = pa.concat_tables([pt] + [p for p in res_parts if p.num_rows])

    def key(tab):
        return sorted(map(tuple, zip(*[c.to_pylist() for c in tab.columns])))
    assert key(got) == key(ref)


@given(st.lists(
    st.tuples(st.sampled_from(["c1", "c2", "c3"]),          # conv_id
              st.integers(0, 12),                            # turn_idx
              st.sampled_from([None, "Alice", "Bob", "Zed"]),  # person
              st.booleans(),                                 # is_pronoun
              st.integers(0, 2)),                            # sent_idx
    min_size=0, max_size=60))
@settings(max_examples=60, deadline=None)
def test_resolve_bucket_fast_equals_slow(rows):
    """The int-key fast resolver and the pandas slow path must agree on
    ANY input set (duplicate turns, pronoun-only convs, missing state)."""
    import pyarrow as pa

    from joern_ray import schema as S
    from joern_ray.stages import extract as X

    # pronoun rows with a person value model OBJECT-pronoun events (the
    # person is the row's own subject; obj resolves); pronoun rows with
    # person None are subject-pronoun events carrying an obj payload
    cols = {
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "person": [r[2] for r in rows],
        "pred": ["works_at" if r[3] else None for r in rows],
        "obj": ["Acme" if (r[3] and r[2] is None) else None for r in rows],
        "obj_kind": [None if not r[3]
                     else ("org" if r[2] is None else "person")
                     for r in rows],
        "sent_idx": pa.array([r[4] for r in rows], pa.int32()),
        "negated": [False] * len(rows),
        "in_question": [False] * len(rows),
        "is_past": [False] * len(rows),
        "aspect": ["simple"] * len(rows),
        "since_year": pa.array([None] * len(rows), pa.int32()),
        "hedged": [False] * len(rows),
        "slot_idx": pa.array([0] * len(rows), pa.int32()),
        "clause": ["main"] * len(rows),
        "desc_key": pa.array([None] * len(rows), pa.string()),
        "bucket": pa.array([0] * len(rows), pa.int64()),
    }
    t = pa.Table.from_pydict(cols)
    # drop rows that are neither state nor pronoun (the subset filter
    # guarantees this in production)
    import pyarrow.compute as pc
    keep = pc.or_(pc.is_valid(t.column("person")),
                  pc.is_valid(t.column("pred")))
    t = t.filter(keep)

    def key(tab):
        return sorted(map(tuple, zip(*[c.to_pylist() for c in tab.columns])))

    fast = X._resolve_bucket(t, None)
    slow = X._resolve_bucket_slow(t.drop_columns(["bucket"]),
                                  X.MAX_RESOLVE_EVENTS_PER_CONV)
    assert key(fast) == key(slow)


def test_stratified_sample_kernel_split_invariant():
    """Sample membership is a pure function of the row set: combining the
    per-batch combiner over ANY partitioning, then finishing, equals one
    global pass (the two-phase contract of text.sample_stratified)."""
    import numpy as np
    import pyarrow as pa

    from joern_ray.pipelines.text import _sample_topk_per_lang

    rng = np.random.default_rng(7)
    n, k = 500, 10
    t = pa.table({
        "doc_id": pa.array(rng.permutation(n).astype("int64")),
        "lang_pred": pa.array(["en" if i % 3 else "other"
                               for i in range(n)]),
        "hsh": pa.array(rng.integers(0, 1000, n).astype("int64")),
    })
    whole = _sample_topk_per_lang(t, k)
    for n_chunks in (2, 7, 50):
        parts = [t.slice(i * (n // n_chunks + 1), n // n_chunks + 1)
                 for i in range(n_chunks)]
        combined = pa.concat_tables(
            [_sample_topk_per_lang(p, k) for p in parts if p.num_rows])
        final = _sample_topk_per_lang(combined, k)
        assert sorted(final.to_pylist(), key=str) == \
            sorted(whole.to_pylist(), key=str)
    # quota respected per stratum
    import collections
    cnt = collections.Counter(whole.column("lang_pred").to_pylist())
    assert all(v <= k for v in cnt.values())


def test_token_bins_multibucket_matches_single_bucket(ray_session):
    """The distributed prefix sum is partitioning-independent: tiny
    bucket_span (many buckets, multi-group path) must equal one giant
    bucket (single in-group cumsum)."""
    from joern_ray.pipelines.text import token_bins

    sf = "/root/testdata/sf0.001"
    a = token_bins(sf, budget=64, bucket_span=16).to_pandas()
    b = token_bins(sf, budget=64, bucket_span=10**9).to_pandas()
    key = ["doc_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    # bins are contiguous from 0
    assert a["bin"].min() == 0


def test_digest_dedup_split_invariant():
    """Exact-dedup digest combine is a pure function of the row set: any
    partitioning of the input through the per-batch combiner + shard
    resolve yields the same (doc_id, n_copies) result."""
    import numpy as np
    import pyarrow as pa

    from joern_ray.pipelines.text import _digest_partial, _digest_shard

    rng = np.random.default_rng(11)
    texts = [f"doc body {i % 7}" for i in range(100)]
    t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "text": texts})

    def run(split_points):
        parts = []
        prev = 0
        for sp in list(split_points) + [t.num_rows]:
            if sp > prev:
                parts.append(_digest_partial(t.slice(prev, sp - prev)))
            prev = sp
        allp = pa.concat_tables(parts)
        outs = []
        for b in sorted(set(allp.column("bucket").to_pylist())):
            import pyarrow.compute as pc
            g = allp.filter(pc.equal(allp.column("bucket"), b))
            outs.append(_digest_shard(g))
        return sorted(map(tuple, (r.values()
                                  for tb in outs
                                  for r in tb.to_pylist())))

    base = run([])
    assert base == run([1, 3, 50, 99])
    assert base == run(sorted(rng.choice(100, 5, replace=False).tolist()))
    # 7 distinct texts, each duplicated ~14x, min doc_id survives
    assert len(base) == 7
    assert all(n >= 14 for _, n in base)


def test_fused_scan_stable_under_input_shuffle(ray_session):
    """The fused single-exchange findings battery is a pure function of
    the row SET — shuffled transcript row order / different partitioning
    must not change any finding."""
    import pyarrow as pa

    import ray.data
    from joern_ray import synth
    from joern_ray.pipelines import findings as FND

    t, _ = synth.generate_corpus(40)
    perm = __import__("numpy").random.default_rng(3).permutation(t.num_rows)
    t2 = t.take(pa.array(perm))

    def rows(tab):
        out = FND.scan(ray.data.from_arrow(tab).repartition(7)).take_all()
        return sorted(map(tuple, (r.values() for r in out)))

    assert rows(t) == rows(t2)
