"""Incremental KG append — the continuous-crawl overlay.

Reference analog: joern's overlay discipline (``Run.scala`` applies a
new pass over an existing CPG without re-running prior passes; the
workspace keeps prior outputs immutable).  Here: append a NEW
transcript shard to an already-built workspace without re-reading or
re-canonicalizing the base corpus — the operation a continuously
crawled 100-TB corpus performs every ingest cycle.

Frozen-directory contract:

  * base entity rows are IMMUTABLE — (kind, norm, canonical, entity_id)
    never change once written, so canonical ids are stable across
    crawls (downstream tables keyed by entity_id never need rewriting);
  * extraction is conversation-local, so the delta's triples come from
    one pass over the delta only;
  * NEW vocabulary links ONE-WAY into the base: delta norms first
    cluster among THEMSELVES (the standard LSH + union-find), then each
    delta component adopts the lexicographically smallest base
    canonical any member fuzzy-matches; components with no base match
    mint new entities (canonical = min member norm, the base rule);
  * divergence from a full rebuild is exactly the cluster-merge case: a
    delta norm bridging two existing base clusters cannot merge them
    (the base is frozen), and an adopted canonical wins even when a new
    member norm sorts below it.  Equivalence with the full rebuild
    holds whenever the delta introduces no such bridge — both
    directions pytest-asserted in tests/test_incremental.py.

Scale shape: the base directory is never collected.  The delta's LSH
band-key set (small — one ingest shard) is broadcast via ``ray.put``;
base rows are filtered MAP-SIDE to the band-matching candidates and
only those few rows reach the driver.  Delta-side state is bounded by
the shard's distinct fuzzy vocabulary (guarded by
``INCR_MAX_DELTA_VOCAB``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .. import schema as S
from ..functions import hashing as H
from ..functions import rules as R
from ..stages import extract as X
from ..stages import link as L
from ..stages import materialize as M

# a crawl shard's distinct fuzzy surfaces; deliberately generous — the
# DELTA is the append unit, not the corpus
INCR_MAX_DELTA_VOCAB = 2_000_000


def _key_col(t: pa.Table) -> pa.ChunkedArray:
    return pc.binary_join_element_wise(
        t.column("kind").cast(pa.string()),
        t.column("norm").cast(pa.string()), "\x00")


def unseen_vocab(new_vocab_ds, base_entities_ds, *,
                 distributed: bool | None = None):
    """Delta vocab rows whose (kind, norm) is absent from the base
    directory.  Broadcast anti-join under the standard entity bound,
    bucketed cogroup beyond it (no driver state)."""
    base = base_entities_ds
    if distributed is None:
        distributed = base.count() > M.BROADCAST_MAX_ENTITIES
    if not distributed:
        # directory-sized broadcast under the same guard the canonical
        # lookup uses (entity_lookup_ref); the cogroup arm below is the
        # beyond-bound escape
        chunks: list[pa.Array] = []
        for b in base.iter_batches(batch_format="pyarrow"):
            if b.num_columns:
                kc = _key_col(b)
                chunks.extend(kc.chunks if isinstance(kc, pa.ChunkedArray)
                              else [kc])
        key_set = (pa.concat_arrays(chunks) if chunks
                   else pa.array([], pa.string()))
        ref = ray.put(key_set)

        def probe(t: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            hit = pc.is_in(_key_col(t), value_set=ks)
            return t.filter(pc.invert(pc.fill_null(hit, False)))

        return new_vocab_ds.map_batches(probe, batch_format="pyarrow")

    def tag(t: pa.Table, is_base: int) -> pa.Table:
        return pa.table({
            "key": _key_col(t),
            "kind": t.column("kind").cast(pa.string()),
            "norm": t.column("norm").cast(pa.string()),
            "is_base": pa.array([is_base] * t.num_rows, pa.int8())})

    both = (base.map_batches(lambda t: tag(t, 1), batch_format="pyarrow")
            .union(new_vocab_ds.map_batches(lambda t: tag(t, 0),
                                            batch_format="pyarrow")))
    out_schema = pa.schema([("kind", pa.string()), ("norm", pa.string())])

    def keep_new_only(g: pa.Table) -> pa.Table:
        if pc.max(g.column("is_base")).as_py() == 1:
            return out_schema.empty_table()
        return g.select(["kind", "norm"]).slice(0, 1)

    return (both.groupby("key")
            .map_groups(keep_new_only, batch_format="pyarrow"))


def incremental_entities(base_entities_ds, unseen_ds) -> pa.Table:
    """Entity rows for the unseen delta vocabulary under the
    frozen-directory contract (module docstring).  Returns an Arrow
    table (the delta is shard-bounded by construction)."""
    delta = [(k, n) for b in unseen_ds.iter_batches(batch_format="pyarrow")
             if b.num_columns
             for k, n in zip(b.column("kind").to_pylist(),
                             b.column("norm").to_pylist())]
    delta = sorted(set(delta))
    if len(delta) > INCR_MAX_DELTA_VOCAB:
        raise ValueError(
            f"delta vocabulary {len(delta)} exceeds INCR_MAX_DELTA_VOCAB "
            f"({INCR_MAX_DELTA_VOCAB}); split the ingest shard")

    # delta-side LSH bands (fuzzy kinds only)
    fuzzy = [(k, n) for k, n in delta if k in R.FUZZY_KINDS]
    shingles = {n: R.char_shingles(n) for _, n in fuzzy}
    bands: dict[str, list[str]] = {}
    for k, n in fuzzy:
        for bk in H.band_keys(H.minhash_signature(shingles[n])):
            bands.setdefault(f"{k}|{bk}", []).append(n)

    # base candidates: filter MAP-SIDE on the broadcast delta band set,
    # collect only band-colliding (norm, canonical) rows
    cand: list[tuple[str, str, str]] = []   # (kind, base_norm, canonical)
    if bands:
        band_ref = ray.put(pa.array(sorted(bands), pa.string()))

        def base_cands(t: pa.Table) -> pa.Table:
            # Arrow-filter to fuzzy kinds first; the per-norm minhash
            # loop then runs over the same distinct-norm population the
            # original build hashed (vocabulary-sized, not corpus-sized)
            t = t.filter(pc.is_in(
                t.column("kind").cast(pa.string()),
                value_set=pa.array(sorted(R.FUZZY_KINDS))))
            bset = set(ray.get(band_ref).to_pylist())
            kk, nn, cc = [], [], []
            for k, n, c in zip(t.column("kind").to_pylist(),
                               t.column("norm").to_pylist(),
                               t.column("canonical").to_pylist()):
                for bk in H.band_keys(H.minhash_signature(
                        R.char_shingles(n))):
                    if f"{k}|{bk}" in bset:
                        kk.append(k)
                        nn.append(n)
                        cc.append(c)
                        break
            return pa.table({"kind": pa.array(kk, pa.string()),
                             "norm": pa.array(nn, pa.string()),
                             "canonical": pa.array(cc, pa.string())})

        for b in (base_entities_ds
                  .map_batches(base_cands, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
            if b.num_columns:
                cand.extend(zip(b.column("kind").to_pylist(),
                                b.column("norm").to_pylist(),
                                b.column("canonical").to_pylist()))

    # new-new union-find (the standard linking rule over the delta)
    parent = {x: x for x in fuzzy}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    from ..stages.link import LSH_BUCKET_CAP
    for bkey, norms in sorted(bands.items()):
        kind = bkey.split("|", 1)[0]
        members = sorted(set(norms))[:LSH_BUCKET_CAP]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if R.jaccard(shingles[members[i]],
                             shingles[members[j]]) \
                        >= R.FUZZY_JACCARD_THRESHOLD:
                    a, b = (kind, members[i]), (kind, members[j])
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        lo, hi = (ra, rb) if ra < rb else (rb, ra)
                        parent[hi] = lo

    # per delta norm: min base canonical it fuzzy-matches (one-way)
    adopt: dict[tuple[str, str], str] = {}
    cand_by_kind: dict[str, list[tuple[str, str]]] = {}
    for k, n, c in cand:
        cand_by_kind.setdefault(k, []).append((n, c))
    for k, n in fuzzy:
        best = None
        for bn, bc in cand_by_kind.get(k, ()):  # bounded band collisions
            if R.jaccard(shingles[n], R.char_shingles(bn)) \
                    >= R.FUZZY_JACCARD_THRESHOLD:
                if best is None or bc < best:
                    best = bc
        if best is not None:
            adopt[(k, n)] = best

    # component canonical: min adopted base canonical, else min member
    comp_adopt: dict[tuple[str, str], str] = {}
    for x in fuzzy:
        r = find(x)
        a = adopt.get(x)
        if a is not None and (r not in comp_adopt or a < comp_adopt[r]):
            comp_adopt[r] = a

    kinds, norms, canons, ids = [], [], [], []
    for k, n in delta:
        if k in R.FUZZY_KINDS:
            r = find((k, n))
            canon = comp_adopt.get(r, r[1])
        else:
            canon = n
        kinds.append(k)
        norms.append(n)
        canons.append(canon)
        ids.append(canon if k == "conv" else H.blake2_id(f"{k}:{canon}"))
    return pa.table({"kind": pa.array(kinds, pa.string()),
                     "norm": pa.array(norms, pa.string()),
                     "canonical": pa.array(canons, pa.string()),
                     "entity_id": pa.array(ids, pa.string())}) \
        .cast(S.ENTITIES)


def append_shard(base_entities_ds, new_transcripts_ds) -> dict:
    """One ingest cycle over a new transcript shard: extract (conv-local,
    one pass) + kind-recovery overlay, link NEW vocabulary under the
    frozen-directory contract, canonicalize the delta triples against
    the merged directory.  Returns dict(entities_delta, entities_merged,
    triples_canonical_delta, triples_surface_delta) — all lazy Datasets
    except the shard-bounded entities_delta table."""
    from ..stages import kindrec as KR

    triples, events = X.extract_triples_and_events(new_transcripts_ds)
    triples = triples.union(
        KR.recovered_triples(new_transcripts_ds, events))
    vocab_new = L.vocab_from_mentions(
        triples.map_batches(L.mentions_from_triples,
                            batch_format="pyarrow"))
    unseen = unseen_vocab(vocab_new, base_entities_ds)
    delta_tab = incremental_entities(base_entities_ds, unseen)
    merged = base_entities_ds.union(ray.data.from_arrow(delta_tab)) \
        .materialize()
    if merged.count() > M.BROADCAST_MAX_ENTITIES:
        canon = M.canonical_triples_cogroup(triples, merged)
    else:
        canon = M.canonical_triples(triples, M.entity_lookup_ref(merged))
    return dict(entities_delta=delta_tab,
                entities_merged=merged,
                triples_canonical_delta=canon,
                triples_surface_delta=triples)


def incremental_check_query(sf_dir: str):
    """queries() surface: split the corpus 90/10 by conv hash, build the
    base from the 90%, append the 10% as an ingest shard, and return the
    delta's canonical triples — deterministic rows whose stability the
    driver can check; full-vs-incremental equivalence is asserted in
    tests/test_incremental.py."""
    from .. import synth
    from . import kg

    tp = synth.transcripts_path(sf_dir)
    full = kg.read_transcripts(tp)

    def split(t: pa.Table, keep_delta: bool) -> pa.Table:
        import numpy as np
        import pandas as pd
        h = pd.util.hash_array(
            t.column("conv_id").cast(pa.string()).to_numpy(
                zero_copy_only=False).astype(object)) % np.uint64(10)
        m = (h == 0) if keep_delta else (h != 0)
        return t.filter(pa.array(m))

    base_ds = full.map_batches(lambda t: split(t, False),
                               batch_format="pyarrow")
    delta_ds = full.map_batches(lambda t: split(t, True),
                                batch_format="pyarrow")
    base = kg.build_graph(base_ds)
    out = append_shard(base["entities"], delta_ds)
    return out["triples_canonical_delta"]
