"""Graph materialization: canonical triples + node/edge Parquet tables.

Analog of the reference's overlay application + export
(``X2Cpg.applyDefaultOverlays`` union-of-diffs, ``JoernExport`` sinks):
append-only stage outputs unioned and deduped on deterministic keys.

Id discipline (SURVEY.md §1.3): no autoincrement / KeyPool coordination —
  entity ids  = blake2b("kind:canonical")     (small table, hashed)
  turn ids    = "<conv_id>#<turn_idx>"        (natural key, zero-cost at
                                               10^12-row scale: vectorized
                                               string concat, no Python loop)
  conv ids    = conv_id
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import schema as S
from .link import normalize_arrays

BROADCAST_MAX_ENTITIES = 5_000_000


def entity_lookup_ref(entities_ds: "ray.data.Dataset"):
    """Build the broadcast side-table: two pandas Series mapping
    "kind\\0norm" → entity_id / canonical (vectorized .map at lookup time).

    The reference holds its FULL_NAME index in memory
    (``LinkingUtil.scala:35-36``); here the directory is `ray.put` ONCE and
    read zero-copy-ish from the local object store by every map task — never
    re-shipped per batch.  Raises if the directory exceeds the broadcast
    bound (the scale path then needs the cogroup rewrite)."""
    import pandas as pd

    keys: list[str] = []
    ids: list[str] = []
    canons: list[str] = []
    for b in entities_ds.iter_batches(batch_format="pyarrow"):
        if b.num_columns == 0:
            continue
        key = pc.binary_join_element_wise(
            b.column("kind").cast(pa.string()),
            b.column("norm").cast(pa.string()), "\x00")
        keys.extend(key.to_pylist())
        ids.extend(b.column("entity_id").to_pylist())
        canons.extend(b.column("canonical").to_pylist())
        if len(keys) > BROADCAST_MAX_ENTITIES:
            raise ValueError("entity directory exceeds broadcast bound; "
                             "use the cogroup rewrite path")
    idx = pd.Index(keys)
    return ray.put((pd.Series(ids, index=idx, dtype=object),
                    pd.Series(canons, index=idx, dtype=object)))


def _resolve_side(kind, norm, id_map, canon_map):
    """Vectorized directory lookup for one triple slot; unlinked mentions
    fall back to a deterministic stub id on their own norm (stub-creation
    discipline, ``TypeDeclStubCreator``)."""
    import numpy as np
    import pandas as pd

    key = pc.binary_join_element_wise(
        kind.cast(pa.string()), norm.cast(pa.string()), "\x00")
    ks = pd.Series(key.to_pylist(), dtype=object)
    ids = ks.map(id_map)
    canon = ks.map(canon_map)
    missing = ids.isna().to_numpy()
    if missing.any():
        idv = ids.to_numpy(object)
        cv = canon.to_numpy(object)
        k_np = kind.to_pylist()
        n_np = norm.to_pylist()
        for i in np.nonzero(missing)[0]:
            k, n = k_np[i], n_np[i]
            idv[i] = n if k == "conv" else f"stub:{k}:{n}"
            cv[i] = n
        return pa.array(idv, pa.string()), pa.array(cv, pa.string())
    return (pa.array(ids.to_numpy(object), pa.string()),
            pa.array(canon.to_numpy(object), pa.string()))


def canonical_triples(triples_ds: "ray.data.Dataset", lookup_ref
                      ) -> "ray.data.Dataset":
    """Surface triples → canonical triples via the broadcast directory."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return S.TRIPLES_CANONICAL.empty_table()
        id_map, canon_map = ray.get(lookup_ref)
        sn = normalize_arrays(t.column("subj_kind"), t.column("subj"))
        on = normalize_arrays(t.column("obj_kind"), t.column("obj"))
        sid, scan = _resolve_side(t.column("subj_kind"), sn,
                                  id_map, canon_map)
        oid, ocan = _resolve_side(t.column("obj_kind"), on,
                                  id_map, canon_map)
        return pa.Table.from_arrays(
            [t.column("conv_id"), t.column("turn_idx").cast(pa.int32()),
             sid, t.column("subj_kind"), scan,
             t.column("pred"),
             oid, t.column("obj_kind"), ocan],
            schema=S.TRIPLES_CANONICAL)
    return triples_ds.map_batches(fn, batch_format="pyarrow")


def _turn_key(conv, tidx) -> pa.Array:
    out = pc.binary_join_element_wise(
        conv.cast(pa.string()), pc.cast(tidx, pa.string()), "#")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def turn_nodes(batch: pa.Table) -> pa.Table:
    """Transcript batch → TURN + (dedup-later) CONVERSATION node rows.
    Pure vectorized projection; preserves per-turn text verbatim."""
    n = batch.num_rows
    key = _turn_key(batch.column("conv_id"), batch.column("turn_idx"))
    return pa.Table.from_arrays(
        [key,
         pa.array(["TURN"] * n, pa.string()),
         pa.nulls(n, pa.string()),
         key,
         batch.column("conv_id").cast(pa.string()),
         batch.column("turn_idx").cast(pa.int32()),
         batch.column("role").cast(pa.string()),
         batch.column("text").cast(pa.string())],
        schema=S.NODES)


def entity_nodes(entities_ds: "ray.data.Dataset", *,
                 distributed: bool | None = None) -> "ray.data.Dataset":
    """Canonical entity directory → one ENTITY node per entity_id
    (members collapse via groupby-min — the TypeNodePass set-union +
    deterministic-order discipline).

    The entity directory is vocabulary-sized (orders of magnitude below the
    corpus), so the dedup defaults to a local Arrow group_by on coalesced
    blocks; the distributed groupby is the escape hatch for directories
    beyond the broadcast bound."""
    def prep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema([("entity_id", pa.string()), ("kind", pa.string()),
                              ("canonical", pa.string())]).empty_table()
        return t.select(["entity_id", "kind", "canonical"])

    prepped = entities_ds.map_batches(prep, batch_format="pyarrow")
    if distributed is None:
        distributed = entities_ds.count() > BROADCAST_MAX_ENTITIES
    if distributed:
        from ray.data.aggregate import Min
        uniq = (prepped.groupby("entity_id")
                .aggregate(Min(on="kind", alias_name="kind"),
                           Min(on="canonical", alias_name="canonical"))
                .repartition(8))
    else:
        def local_min(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            return (t.group_by("entity_id")
                    .aggregate([("kind", "min"), ("canonical", "min")])
                    .rename_columns(["entity_id", "kind", "canonical"]))
        uniq = prepped.repartition(1).map_batches(
            local_min, batch_format="pyarrow")

    def fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return S.NODES.empty_table()
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("entity_id"),
             pa.array(["ENTITY"] * n, pa.string()),
             t.column("kind"),
             t.column("canonical"),
             pa.nulls(n, pa.string()),
             pa.nulls(n, pa.int32()),
             pa.nulls(n, pa.string()),
             pa.nulls(n, pa.string())],
            schema=S.NODES)
    return uniq.map_batches(fn, batch_format="pyarrow")


def next_turn_edges(batch: pa.Table) -> pa.Table:
    """Per-row derivable NEXT_TURN (CFG-analog) edges: turn t-1 → t for every
    t > 0.  No grouping or shuffle needed (edge existence is local to a row:
    its predecessor key is computable from (conv_id, turn_idx) alone)."""
    mask = pc.greater(batch.column("turn_idx"), 0)
    sub = batch.filter(mask)
    n = sub.num_rows
    conv = sub.column("conv_id")
    tidx = sub.column("turn_idx")
    prev = pc.subtract(tidx, 1).cast(pa.int32())
    return pa.Table.from_arrays(
        [_turn_key(conv, prev),
         _turn_key(conv, tidx),
         pa.array(["NEXT_TURN"] * n, pa.string()),
         pa.nulls(n, pa.string()),
         conv.cast(pa.string()),
         tidx.cast(pa.int32())],
        schema=S.EDGES)


def fact_and_mention_edges(canon_triples_ds: "ray.data.Dataset"
                           ) -> "ray.data.Dataset":
    """Canonical triples → FACT edges (entity→entity) + MENTIONS edges
    (turn→entity, both slots)."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return S.EDGES.empty_table()
        n = t.num_rows
        conv = t.column("conv_id").cast(pa.string())
        tidx = t.column("turn_idx").cast(pa.int32())
        tkey = _turn_key(conv, tidx)
        fact = pa.Table.from_arrays(
            [t.column("subj_id"), t.column("obj_id"),
             pa.array(["FACT"] * n, pa.string()),
             t.column("pred"), conv, tidx],
            schema=S.EDGES)
        mention_s = pa.Table.from_arrays(
            [tkey, t.column("subj_id"),
             pa.array(["MENTIONS"] * n, pa.string()),
             pa.nulls(n, pa.string()), conv, tidx],
            schema=S.EDGES)
        mention_o = pa.Table.from_arrays(
            [tkey, t.column("obj_id"),
             pa.array(["MENTIONS"] * n, pa.string()),
             pa.nulls(n, pa.string()), conv, tidx],
            schema=S.EDGES)
        return pa.concat_tables([fact, mention_s, mention_o])
    return canon_triples_ds.map_batches(fn, batch_format="pyarrow")
