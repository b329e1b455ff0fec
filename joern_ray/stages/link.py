"""Entity linking: mentions → normalized keys → MinHash/LSH candidate
blocking → verified coreference edges → union-find → canonical entities.

Reference analogs (SURVEY.md §2.4/§2.6):
- normalization before lookup          ↔ ``Dereference.dereferenceTypeFullName``
- candidate-set generation by blocking ↔ ``DynamicCallLinker`` SAFEDISPATCH
  candidate sets (``DynamicCallLinker.scala:25-224``)
- exact get-or-create on canonical key ↔ ``TypeDeclStubCreator`` /
  ``FileCreationPass`` anti-join + groupby.first
- set-union + sort for determinism     ↔ ``TypeNodePass.scala:44-58``

Skew handling (SURVEY.md §4): mention→vocab dedup is two-phase (per-batch
local distinct combiner, then the global groupby) so hot entities (Zipfian
mentions) never funnel raw mention rows into one reducer; LSH buckets are
size-capped.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count

from .. import schema as S
from ..functions import hashing as H
from ..functions import rules as R
from .cc import connected_components

_ORG_STOP_RE = r"\b(corp|corporation|inc|labs|llc|ltd|the|group)\b"
LSH_BUCKET_CAP = 64


def normalize_arrays(kind: pa.ChunkedArray, surface) -> pa.Array:
    """Vectorized mirror of rules.normalize_surface (must stay in lockstep)."""
    low = pc.utf8_trim_whitespace(pc.utf8_lower(surface))
    stripped = pc.replace_substring_regex(low, _ORG_STOP_RE, "")
    squeezed = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(stripped, r"\s+", " "))
    # empty-after-strip falls back to the lowercased surface (rules.py parity)
    org_norm = pc.if_else(pc.equal(squeezed, ""), low, squeezed)
    out = pc.if_else(pc.equal(kind, "org"), org_norm, low)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def mentions_from_triples(batch: pa.Table) -> pa.Table:
    """Surface triples batch → mention rows (subject + object slots)."""
    parts = []
    for side, kind_col in (("subj", "subj_kind"), ("obj", "obj_kind")):
        surf = batch.column(side)
        kind = batch.column(kind_col)
        parts.append(pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "kind": kind,
            "surface": surf,
            "norm": normalize_arrays(kind, surf),
        }))
    return S.MENTIONS.empty_table() if not parts else pa.concat_tables(parts)


_NONLINK = pa.array(sorted(R.NONLINK_KINDS))


def _local_distinct(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse duplicate (kind, norm) before the global
    shuffle — the partial-aggregation pattern for hot-key skew.  Natural-key
    kinds never enter the vocabulary (they resolve to themselves)."""
    if batch.num_rows == 0 or batch.num_columns == 0:
        return pa.schema([("kind", pa.string()), ("norm", pa.string())]).empty_table()
    keep = pc.invert(pc.fill_null(
        pc.is_in(batch.column("kind"), value_set=_NONLINK), False))
    return (batch.filter(keep).select(["kind", "norm"])
            .group_by(["kind", "norm"]).aggregate([]))


def vocab_from_mentions(mentions_ds: "ray.data.Dataset", *,
                        distributed: bool | None = None
                        ) -> "ray.data.Dataset":
    """Distinct (kind, norm) vocabulary — the entity directory to link.

    Per-batch local distinct always runs first (the combiner), so the
    global dedup sees at most |vocab| × n_blocks rows.  When that combined
    set is small it coalesces to one block and dedups locally (no shuffle);
    the groupby path covers directory-scale vocabularies."""
    combined = mentions_ds.map_batches(
        _local_distinct, batch_format="pyarrow").materialize()
    if distributed is None:
        distributed = combined.count() > 4 * DRIVER_MAX_VOCAB
    if distributed:
        return (combined
                .groupby(["kind", "norm"])
                .aggregate(Count(alias_name="n_parts"))
                .map_batches(lambda t: (t.select(["kind", "norm"])
                                        if t.num_columns else t),
                             batch_format="pyarrow")
                .repartition(8))
    return combined.repartition(1).map_batches(
        _local_distinct, batch_format="pyarrow")


def _lsh_keys_batch(batch: pa.Table) -> pa.Table:
    """Fuzzy-kind vocab rows → (bucket, kind, norm) LSH band rows.

    Batch-vectorized: ALL rows' shingles hash in ONE pd.hash_array call and
    the per-row MinHash folds via np.minimum.at over an (n, N_PERMS)
    matrix — byte-identical to the scalar ``H.minhash_signature`` path
    (asserted by the driver-vs-distributed entity equality test), without
    its per-row hash-call overhead."""
    import numpy as np

    kinds = batch.column("kind").to_pylist()
    norms = batch.column("norm").to_pylist()
    n = len(norms)
    if n == 0:
        return pa.table({"bucket": pa.array([], pa.string()),
                         "kind": pa.array([], pa.string()),
                         "norm": pa.array([], pa.string())})
    all_sh: list[str] = []
    owner: list[int] = []
    for i, norm in enumerate(norms):
        sh = R.char_shingles(norm)
        all_sh.extend(sh)
        owner.extend([i] * len(sh))
    hs = H.hash_strings(all_sh)
    vals = (hs[:, None] * H._A[None, :] + H._B[None, :]) \
        % np.uint64(H.MERSENNE_P)
    sigs = np.full((n, H.N_PERMS), H.MERSENNE_P, dtype=np.uint64)
    np.minimum.at(sigs, np.asarray(owner), vals)
    out_bucket, out_kind, out_norm = [], [], []
    for i, (kind, norm) in enumerate(zip(kinds, norms)):
        for bk in H.band_keys(sigs[i]):
            out_bucket.append(f"{kind}|{bk}")
            out_kind.append(kind)
            out_norm.append(norm)
    return pa.table({"bucket": pa.array(out_bucket, pa.string()),
                     "kind": pa.array(out_kind, pa.string()),
                     "norm": pa.array(out_norm, pa.string())})


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """One LSH bucket → verified coreference edges (Jaccard >= threshold).

    Buckets are capped at LSH_BUCKET_CAP members (sorted, deterministic) —
    the bail-out analog of the reference's 4000-defs dataflow cap
    (``ReachingDefPass.scala:40-52``)."""
    norms = sorted(set(group.column("norm").to_pylist()))
    if len(norms) > LSH_BUCKET_CAP:
        norms = norms[:LSH_BUCKET_CAP]
    kind = group.column("kind")[0].as_py()
    a_out, b_out = [], []
    shingles = {n: R.char_shingles(n) for n in norms}
    for i in range(len(norms)):
        for j in range(i + 1, len(norms)):
            if R.jaccard(shingles[norms[i]], shingles[norms[j]]) >= R.FUZZY_JACCARD_THRESHOLD:
                a_out.append(f"{kind}\x00{norms[i]}")
                b_out.append(f"{kind}\x00{norms[j]}")
    return pa.table({"a": pa.array(a_out, pa.string()),
                     "b": pa.array(b_out, pa.string())})


def coref_edges(vocab_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """LSH blocking over fuzzy-kind vocabulary → deduped coreference edges."""
    fuzzy_kinds = pa.array(sorted(R.FUZZY_KINDS))
    fuzzy = vocab_ds.map_batches(
        lambda t: (t.filter(pc.is_in(t.column("kind"), value_set=fuzzy_kinds))
                   if t.num_columns else t),
        batch_format="pyarrow")
    keyed = fuzzy.map_batches(_lsh_keys_batch, batch_format="pyarrow")
    pairs = keyed.groupby("bucket").map_groups(
        _bucket_pairs, batch_format="pyarrow")
    # same pair surfaces from multiple bands → exact dedup
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="nb")) \
        .map_batches(lambda t: (t.select(["a", "b"]) if t.num_columns else
                                pa.schema([("a", pa.string()), ("b", pa.string())]).empty_table()),
                     batch_format="pyarrow") \
        .repartition(8)


# vocabulary sizes below this take the driver-side linking fast path: the
# whole LSH + verify + union-find chain is vocabulary-sized (≪ corpus), and
# the distributed version pays 3 shuffles of fixed latency.  Same results by
# construction (identical bucket/cap/threshold semantics).
DRIVER_MAX_VOCAB = 100_000


def _entities_driver(vocab: "ray.data.Dataset") -> "ray.data.Dataset":
    """In-process mirror of the distributed linking chain for small vocabs
    (reference precedent: DynamicCallLinker's in-memory candidate caches)."""
    rows: list[tuple[str, str]] = []
    for b in vocab.iter_batches(batch_format="pyarrow"):
        if b.num_columns:
            rows.extend(zip(b.column("kind").to_pylist(),
                            b.column("norm").to_pylist()))
    rows = sorted(set(rows))
    buckets: dict[str, set[str]] = {}
    for kind, norm in rows:
        if kind not in R.FUZZY_KINDS:
            continue
        sig = H.minhash_signature(R.char_shingles(norm))
        for bk in H.band_keys(sig):
            buckets.setdefault(f"{kind}|{bk}", set()).add(norm)
    parent: dict[tuple[str, str], tuple[str, str]] = {r: r for r in rows}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for bkey, norms in buckets.items():
        kind = bkey.split("|", 1)[0]
        members = sorted(norms)[:LSH_BUCKET_CAP]
        shingles = {n: R.char_shingles(n) for n in members}
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if R.jaccard(shingles[members[i]],
                             shingles[members[j]]) >= R.FUZZY_JACCARD_THRESHOLD:
                    a, b = (kind, members[i]), (kind, members[j])
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        lo, hi = (ra, rb) if ra < rb else (rb, ra)
                        parent[hi] = lo
    kinds, norms, canons, ids = [], [], [], []
    for kind, norm in rows:
        canon = find((kind, norm))[1]
        kinds.append(kind)
        norms.append(norm)
        canons.append(canon)
        ids.append(canon if kind == "conv" else H.blake2_id(f"{kind}:{canon}"))
    return ray.data.from_arrow(pa.table(
        {"kind": pa.array(kinds, pa.string()),
         "norm": pa.array(norms, pa.string()),
         "canonical": pa.array(canons, pa.string()),
         "entity_id": pa.array(ids, pa.string())}).cast(S.ENTITIES))


def build_entities(vocab_ds: "ray.data.Dataset", *, max_iters: int = 12,
                   distributed: bool | None = None) -> "ray.data.Dataset":
    """Vocabulary → canonical entity table (schema S.ENTITIES).

    Non-fuzzy kinds canonicalize to their own norm; fuzzy kinds go through
    LSH + union-find and canonicalize to the component's min norm.
    """
    vocab = vocab_ds.materialize()
    if distributed is None:
        distributed = vocab.count() > DRIVER_MAX_VOCAB
    if not distributed:
        return _entities_driver(vocab)
    edges = coref_edges(vocab)
    nodes = vocab.map_batches(
        lambda t: pa.table({"node": pc.binary_join_element_wise(
            t.column("kind").cast(pa.string()),
            t.column("norm").cast(pa.string()), "\x00")}),
        batch_format="pyarrow")
    labels = connected_components(edges, nodes, max_iters=max_iters)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return S.ENTITIES.empty_table()
        nodes_split = pc.split_pattern(t.column("node"), "\x00")
        labels_split = pc.split_pattern(t.column("label"), "\x00")
        kind = pc.list_element(nodes_split, 0)
        norm = pc.list_element(nodes_split, 1)
        canonical = pc.list_element(labels_split, 1)
        ids = pa.array(
            [e if k == "conv" else H.blake2_id(f"{k}:{e}")
             for k, e in zip(kind.to_pylist(), canonical.to_pylist())],
            pa.string())
        return pa.table({"kind": kind, "norm": norm,
                         "canonical": canonical, "entity_id": ids})

    return labels.map_batches(finish, batch_format="pyarrow")
