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
from ..functions import rules as R
from .link import normalize_arrays

_NONLINK_ARR = pa.array(sorted(R.NONLINK_KINDS))

BROADCAST_MAX_ENTITIES = 5_000_000


def entity_lookup_ref(entities_ds: "ray.data.Dataset"):
    """Build the broadcast side-table: one Arrow table
    (kind, norm, entity_id, canonical) for zero-copy Acero hash joins.

    The reference holds its FULL_NAME index in memory
    (``LinkingUtil.scala:35-36``); here the directory is `ray.put` ONCE and
    read zero-copy-ish from the local object store by every map task — never
    re-shipped per batch.  Raises if the directory exceeds the broadcast
    bound (the scale path then needs the cogroup rewrite)."""
    parts = [b for b in entities_ds.iter_batches(batch_format="pyarrow")
             if b.num_columns]
    table = (pa.concat_tables(parts).combine_chunks() if parts
             else S.ENTITIES.empty_table())
    if table.num_rows > BROADCAST_MAX_ENTITIES:
        raise ValueError("entity directory exceeds broadcast bound; "
                         "use the cogroup rewrite path")
    return ray.put(table.select(["kind", "norm", "entity_id", "canonical"]))


def _resolve_slot(t: pa.Table, side: str, ents: pa.Table) -> pa.Table:
    """Acero left-outer hash join of one triple slot against the broadcast
    directory; unlinked mentions fall back to deterministic stubs on their
    own norm (stub-creation discipline, ``TypeDeclStubCreator``).  Joins on
    (kind, norm) — never on the wide surface strings."""
    kind_col = f"{side}_kind"
    norm = normalize_arrays(t.column(kind_col), t.column(side))
    t = t.append_column(f"{side}_norm", norm)
    right = ents.rename_columns(
        ["kind", "norm", f"{side}_id", f"{side}_canonical"])
    joined = t.join(right, keys=[kind_col, f"{side}_norm"],
                    right_keys=["kind", "norm"], join_type="left outer")
    ids = joined.column(f"{side}_id")
    canon = joined.column(f"{side}_canonical")
    kind = joined.column(kind_col)
    jnorm = joined.column(f"{side}_norm")
    stub = pc.if_else(
        pc.is_in(kind, value_set=_NONLINK_ARR), jnorm,
        pc.binary_join_element_wise("stub", kind.cast(pa.string()),
                                    jnorm.cast(pa.string()), ":"))
    ids = pc.coalesce(ids, stub)
    canon = pc.coalesce(canon, jnorm)
    joined = joined.drop_columns([f"{side}_id", f"{side}_canonical"])
    joined = joined.append_column(f"{side}_id", ids)
    return joined.append_column(f"{side}_canonical", canon)


def canonical_triples_cogroup(triples_ds: "ray.data.Dataset",
                              entities_ds: "ray.data.Dataset",
                              *, n_buckets: int = 1024
                              ) -> "ray.data.Dataset":
    """Fully distributed canonicalization — the scale path for entity
    directories beyond the broadcast bound (no driver-side collection at
    any point).

    Three keyed exchanges, all on narrow rows:
      1. slot rows (kind, norm, conv_id, turn_idx, slot) ∪ tagged directory
         rows, groupby(kind, norm) → resolved slot rows (misses → stubs);
      2+3. resolved slot rows ∪ original triples, groupby(conv-hash
         bucket) → pandas merge back onto the triple rows.
    (conv_id, turn_idx) is the triple uid — one extraction event per turn.
    """
    import pandas as pd

    def slot_rows(t: pa.Table) -> pa.Table:
        parts = []
        for slot, side, kcol in (("s", "subj", "subj_kind"),
                                 ("o", "obj", "obj_kind")):
            parts.append(pa.table({
                "kind": t.column(kcol),
                "norm": normalize_arrays(t.column(kcol), t.column(side)),
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx").cast(pa.int32()),
                "slot": pa.array([slot] * t.num_rows, pa.string()),
                "entity_id": pa.nulls(t.num_rows, pa.string()),
                "canonical": pa.nulls(t.num_rows, pa.string()),
            }))
        return pa.concat_tables(parts)

    def dir_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([
                ("kind", pa.string()), ("norm", pa.string()),
                ("conv_id", pa.string()), ("turn_idx", pa.int32()),
                ("slot", pa.string()), ("entity_id", pa.string()),
                ("canonical", pa.string())]).empty_table()
        n = t.num_rows
        return pa.table({
            "kind": t.column("kind"), "norm": t.column("norm"),
            "conv_id": pa.nulls(n, pa.string()),
            "turn_idx": pa.nulls(n, pa.int32()),
            "slot": pa.nulls(n, pa.string()),
            "entity_id": t.column("entity_id"),
            "canonical": t.column("canonical"),
        })

    def resolve_group(g: pa.Table) -> pa.Table:
        mask_dir = pc.is_null(g.column("slot"))
        dirs = g.filter(mask_dir)
        ments = g.filter(pc.invert(mask_dir))
        if ments.num_rows == 0:
            return pa.schema([
                ("conv_id", pa.string()), ("turn_idx", pa.int32()),
                ("slot", pa.string()), ("entity_id", pa.string()),
                ("canonical", pa.string())]).empty_table()
        kind = g.column("kind")[0].as_py()
        norm = g.column("norm")[0].as_py()
        if dirs.num_rows:
            eid = dirs.column("entity_id")[0].as_py()
            canon = dirs.column("canonical")[0].as_py()
        else:  # stub (get-or-create discipline)
            eid = norm if kind in R.NONLINK_KINDS else f"stub:{kind}:{norm}"
            canon = norm
        n = ments.num_rows
        return pa.table({
            "conv_id": ments.column("conv_id"),
            "turn_idx": ments.column("turn_idx"),
            "slot": ments.column("slot"),
            "entity_id": pa.array([eid] * n, pa.string()),
            "canonical": pa.array([canon] * n, pa.string()),
        })

    resolved = (triples_ds.map_batches(slot_rows, batch_format="pyarrow")
                .union(entities_ds.map_batches(dir_rows,
                                               batch_format="pyarrow"))
                .groupby(["kind", "norm"])
                .map_groups(resolve_group, batch_format="pyarrow"))

    def bucketed(name_fn, ds):
        def fn(t: pa.Table) -> pa.Table:
            t = name_fn(t)
            h = pd.util.hash_array(t.column("conv_id").to_numpy(
                zero_copy_only=False))
            return t.append_column(
                "bucket", pa.array((h % n_buckets).astype("int64")))
        return ds.map_batches(fn, batch_format="pyarrow")

    def tag_triple(t: pa.Table) -> pa.Table:
        return t.append_column("slot", pa.nulls(t.num_rows, pa.string()))

    def merge_group(g: pa.Table) -> pa.Table:
        df = g.drop_columns(["bucket"]).to_pandas()
        trip = df[df["pred"].notna()]
        res = df[df["pred"].isna()]
        s = res[res["slot"] == "s"][["conv_id", "turn_idx", "entity_id",
                                     "canonical"]] \
            .rename(columns={"entity_id": "subj_id",
                             "canonical": "subj_canonical"})
        o = res[res["slot"] == "o"][["conv_id", "turn_idx", "entity_id",
                                     "canonical"]] \
            .rename(columns={"entity_id": "obj_id",
                             "canonical": "obj_canonical"})
        out = trip.merge(s, on=["conv_id", "turn_idx"], how="left") \
                  .merge(o, on=["conv_id", "turn_idx"], how="left")
        cols = [f.name for f in S.TRIPLES_CANONICAL]
        return pa.Table.from_pandas(out[cols], schema=S.TRIPLES_CANONICAL,
                                    preserve_index=False)

    def widen_triple(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx").cast(pa.int32()),
            "slot": pa.nulls(n, pa.string()),
            "entity_id": pa.nulls(n, pa.string()),
            "canonical": pa.nulls(n, pa.string()),
            "subj_kind": t.column("subj_kind"),
            "obj_kind": t.column("obj_kind"),
            "pred": t.column("pred"),
        })

    def widen_resolved(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([
                ("conv_id", pa.string()), ("turn_idx", pa.int32()),
                ("slot", pa.string()), ("entity_id", pa.string()),
                ("canonical", pa.string()), ("subj_kind", pa.string()),
                ("obj_kind", pa.string()), ("pred", pa.string()),
            ]).empty_table()
        n = t.num_rows
        return pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "slot": t.column("slot"),
            "entity_id": t.column("entity_id"),
            "canonical": t.column("canonical"),
            "subj_kind": pa.nulls(n, pa.string()),
            "obj_kind": pa.nulls(n, pa.string()),
            "pred": pa.nulls(n, pa.string()),
        })

    tagged = bucketed(widen_triple, triples_ds).union(
        bucketed(widen_resolved, resolved))
    return tagged.groupby("bucket").map_groups(
        merge_group, batch_format="pyarrow")


def canonical_triples(triples_ds: "ray.data.Dataset", lookup_ref
                      ) -> "ray.data.Dataset":
    """Surface triples → canonical triples via broadcast-table hash joins
    (the LinkingUtil.linkToSingle analog: src rows carry a normalized FK,
    resolve against the directory, stub on miss)."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return S.TRIPLES_CANONICAL.empty_table()
        ents = ray.get(lookup_ref)
        t = _resolve_slot(t, "subj", ents)
        t = _resolve_slot(t, "obj", ents)
        return pa.Table.from_arrays(
            [t.column("conv_id"), t.column("turn_idx").cast(pa.int32()),
             t.column("subj_id").cast(pa.string()), t.column("subj_kind"),
             t.column("subj_canonical").cast(pa.string()),
             t.column("pred"),
             t.column("obj_id").cast(pa.string()), t.column("obj_kind"),
             t.column("obj_canonical").cast(pa.string())],
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


def replies_to_edges(batch: pa.Table) -> pa.Table:
    """Assistant turn t → preceding turn t-1 (REPLIES_TO, the REF analog).
    Per-row derivable like NEXT_TURN — no grouping."""
    mask = pc.and_(pc.equal(batch.column("role"), "assistant"),
                   pc.greater(batch.column("turn_idx"), 0))
    sub = batch.filter(pc.fill_null(mask, False))
    n = sub.num_rows
    conv = sub.column("conv_id")
    tidx = sub.column("turn_idx")
    prev = pc.subtract(tidx, 1).cast(pa.int32())
    return pa.Table.from_arrays(
        [_turn_key(conv, tidx),
         _turn_key(conv, prev),
         pa.array(["REPLIES_TO"] * n, pa.string()),
         pa.nulls(n, pa.string()),
         conv.cast(pa.string()),
         tidx.cast(pa.int32())],
        schema=S.EDGES)


def fact_and_mention_edges(canon_triples_ds: "ray.data.Dataset"
                           ) -> "ray.data.Dataset":
    """Canonical triples → FACT edges (entity→entity) + MENTIONS edges
    (turn→entity) + USES_TOOL edges (turn→tool entity for invocation
    facts, the CALL-edge analog; the turn→own-conversation mention is
    elided as noise)."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return S.EDGES.empty_table()
        n = t.num_rows
        conv = t.column("conv_id").cast(pa.string())
        tidx = t.column("turn_idx").cast(pa.int32())
        tkey = _turn_key(conv, tidx)
        is_inv = pc.equal(t.column("pred"), "invoked")
        fact = pa.Table.from_arrays(
            [t.column("subj_id"), t.column("obj_id"),
             pa.array(["FACT"] * n, pa.string()),
             t.column("pred"), conv, tidx],
            schema=S.EDGES)
        not_inv = pc.invert(is_inv)
        mention_s = pa.Table.from_arrays(
            [tkey, t.column("subj_id"),
             pa.array(["MENTIONS"] * n, pa.string()),
             pa.nulls(n, pa.string()), conv, tidx],
            schema=S.EDGES).filter(not_inv)
        obj_label = pc.if_else(is_inv, "USES_TOOL", "MENTIONS")
        mention_o = pa.Table.from_arrays(
            [tkey, t.column("obj_id"),
             obj_label.combine_chunks() if isinstance(obj_label, pa.ChunkedArray) else obj_label,
             pa.nulls(n, pa.string()), conv, tidx],
            schema=S.EDGES)
        return pa.concat_tables([fact, mention_s, mention_o])
    return canon_triples_ds.map_batches(fn, batch_format="pyarrow")
