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


def _cogroup_resolve_pass(ds: "ray.data.Dataset",
                          entities_ds: "ray.data.Dataset",
                          side: str, carry: list[tuple[str, pa.DataType]],
                          n_buckets: int) -> "ray.data.Dataset":
    """One distributed resolve pass: attach ``<side>_id`` /
    ``<side>_canonical`` to every input row by co-locating rows with the
    directory shard that owns their (kind, norm) key.

    Rows are bucketed by hash(kind, norm) — NOT grouped per key — so each
    group is a many-key shard resolved with one vectorized Acero join
    (``_resolve_slot``), and the full input row flows through intact: no
    merge-back join, hence no dependence on any uid and no cross-join risk
    on duplicate (conv_id, turn_idx) rows (dirty input, multi-match turns).
    Hot keys cost only their share of one bucket's join, not a per-key
    Python group."""
    import pandas as pd

    kcol = f"{side}_kind"
    carry_names = [n for n, _ in carry]
    union_fields = carry + [("dkind", pa.string()), ("dnorm", pa.string()),
                            ("d_entity_id", pa.string()),
                            ("d_canonical", pa.string())]
    union_schema = pa.schema(union_fields + [("bucket", pa.int64())])
    out_schema = pa.schema(carry + [(f"{side}_id", pa.string()),
                                    (f"{side}_canonical", pa.string())])

    def _bucket_of(kind: pa.ChunkedArray, norm) -> pa.Array:
        key = pc.binary_join_element_wise(
            pc.cast(kind, pa.string()), pc.cast(norm, pa.string()), "\x1f")
        h = pd.util.hash_array(key.to_numpy(zero_copy_only=False))
        return pa.array((h % n_buckets).astype("int64"))

    def ment_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return union_schema.empty_table()
        norm = normalize_arrays(t.column(kcol), t.column(side))
        n = t.num_rows
        cols = [t.column(nm).cast(ty) for nm, ty in carry]
        cols += [pa.nulls(n, pa.string())] * 4
        cols.append(_bucket_of(t.column(kcol), norm))
        return pa.Table.from_arrays(cols, schema=union_schema)

    def dir_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return union_schema.empty_table()
        n = t.num_rows
        cols = [pa.nulls(n, ty) for _, ty in carry]
        cols += [t.column("kind"), t.column("norm"),
                 t.column("entity_id"), t.column("canonical")]
        cols.append(_bucket_of(t.column("kind"), t.column("norm")))
        return pa.Table.from_arrays(cols, schema=union_schema)

    def resolve_shard(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        is_dir = pc.is_valid(g.column("dkind"))
        dirs = g.filter(is_dir)
        ments = g.filter(pc.invert(is_dir))
        if ments.num_rows == 0:
            return out_schema.empty_table()
        ents = pa.Table.from_arrays(
            [dirs.column("dkind"), dirs.column("dnorm"),
             dirs.column("d_entity_id"), dirs.column("d_canonical")],
            names=["kind", "norm", "entity_id", "canonical"])
        ments = pa.Table.from_arrays(
            [ments.column(nm) for nm in carry_names],
            schema=pa.schema(carry))
        joined = _resolve_slot(ments, side, ents)
        return pa.Table.from_arrays(
            [joined.column(nm).cast(ty) for nm, ty in carry] +
            [joined.column(f"{side}_id").cast(pa.string()),
             joined.column(f"{side}_canonical").cast(pa.string())],
            schema=out_schema)

    tagged = (ds.map_batches(ment_rows, batch_format="pyarrow")
              .union(entities_ds.map_batches(dir_rows,
                                             batch_format="pyarrow")))
    return tagged.groupby("bucket").map_groups(
        resolve_shard, batch_format="pyarrow")


def canonical_triples_cogroup(triples_ds: "ray.data.Dataset",
                              entities_ds: "ray.data.Dataset",
                              *, n_buckets: int = 1024
                              ) -> "ray.data.Dataset":
    """Fully distributed canonicalization — the scale path for entity
    directories beyond the broadcast bound (no driver-side collection at
    any point): two bucketed resolve passes (subj, then obj), each a
    hash(kind,norm)-sharded Acero join that carries the whole triple row
    through, so row identity is preserved structurally (equivalence with
    the broadcast path is pytest-asserted, including duplicate-turn_idx
    dirty input)."""
    surf = [(f.name, f.type) for f in S.TRIPLES_SURFACE]
    p1 = _cogroup_resolve_pass(triples_ds, entities_ds, "subj", surf,
                               n_buckets)
    p2 = _cogroup_resolve_pass(
        p1, entities_ds, "obj",
        surf + [("subj_id", pa.string()), ("subj_canonical", pa.string())],
        n_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return S.TRIPLES_CANONICAL.empty_table()
        return S.cast_to(t, S.TRIPLES_CANONICAL)

    return p2.map_batches(finalize, batch_format="pyarrow")


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


def encode_canonical_store(t: pa.Table) -> pa.Table:
    """Compact object-store layout for a canonical-triples batch: every
    column except conv_id/turn_idx draws its values from the entity /
    predicate vocabulary (ids are blake2b(kind:canonical) — also
    vocabulary-sized), so each is dictionary-encoded to int32 indices +
    a tiny per-chunk dictionary for the materialized copy.  Pair with
    ``decode_canonical_store`` on the read side; consumers replay only
    that cheap decode map over the stored narrow blocks."""
    cols, names = [], []
    for f in S.TRIPLES_CANONICAL:
        c = t.column(f.name)
        if f.name in ("conv_id", "turn_idx"):
            cols.append(c)
        else:
            cols.append(pc.dictionary_encode(
                c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c))
        names.append(f.name)
    return pa.Table.from_arrays(cols, names=names)


def decode_canonical_store(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        return S.TRIPLES_CANONICAL.empty_table()
    return t.cast(S.TRIPLES_CANONICAL)


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


def skip_edges(batch: pa.Table) -> pa.Table:
    """Deterministic branch edges for the dominator/CDG operators: turn
    t-2 → t for every turn t ≥ 2 with (t-2) % 5 == 2.  Emitted from the
    DESTINATION row, so existence is per-row derivable (no grouping): on
    contiguous turn indices both endpoints and the bypassed middle turn
    exist whenever t ≥ 2.  The fixed modulus keeps skip sources ≥ 5 apart,
    so each forms an isolated diamond whose control-dependence closed form
    ((s, s+1) per source s) is exactly SQL-expressible — the kg_cdg
    oracle's contract."""
    tidx_np = batch.column("turn_idx").to_numpy(zero_copy_only=False)
    mask = pa.array((tidx_np >= 2) & ((tidx_np - 2) % 5 == 2))
    sub = batch.filter(mask)
    n = sub.num_rows
    conv = sub.column("conv_id")
    tidx = sub.column("turn_idx")
    prev2 = pc.subtract(tidx, 2).cast(pa.int32())
    return pa.Table.from_arrays(
        [_turn_key(conv, prev2),
         _turn_key(conv, tidx),
         pa.array(["SKIP"] * n, pa.string()),
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
