"""Kind recovery: bounded-iteration typing of untyped mentions — the
``XTypeRecovery`` analog (reference:
``x2cpg/passes/frontend/XTypeRecovery.scala:23-110`` — bounded-round
inference of unknown symbol types from the contexts identically-named
symbols appear in, "avoid the poor scalability of a fixed-point
algorithm").

Input: "mentioned" sentences (``rules.MENTIONED_RE``) whose object kind is
UNKNOWN at extraction time.  Evidence: every typed slot of the standard
extraction-event stream — (conv_id, surface, kind) where the surface
appears as a template subject/object with a declared kind.  Two rounds,
closest scope first (deterministic min(kind) tie-break in both):

  round 1 — conversation-local: evidence from the mention's OWN
            conversation;
  round 2 — global: the corpus-wide (surface → min kind) vocabulary.

Unrecovered mentions keep kind='unknown', round=0 (stub semantics — they
are dropped before canonicalization, the ``TypeDeclStubCreator``-without-
evidence case).

Scale shape — auto-dispatch at ``DRIVER_MAX_UNKNOWNS`` (the
``materialize.BROADCAST_MAX_ENTITIES`` discipline):
  * driver path (≤ bound; fixed-latency win at bench scale): the unknown
    (conv_id, surface) key set broadcasts as a sorted uint64 hash array
    (``ray.put`` once) and every EVENTS batch filters itself map-side —
    evidence never enters a shuffle; only matching candidate rows reach
    one small groupby.  Round 2's dictionary is restricted to surfaces
    that appear among the unknowns (never the full vocabulary).
  * distributed path (> bound; the 100-TB shape — the unknown set is
    corpus-proportional and must never be collected):
    ``recover_distributed`` — two narrow keyed exchanges carrying the
    unknown rows' payload through hash-bucketed shard joins (conv-bucket
    attaches the conv-local kind, surface-bucket attaches the global
    kind and emits the final rows).  NO driver state at any point;
    equivalence with the driver path is pytest-asserted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import schema as S
from ..functions import rules as R
from .extract import _attrs, _decode_narrow, _explode_sentences

# above this many unknown-mention rows the recovery runs FULLY
# distributed (recover_distributed — two keyed exchanges, no driver
# state); below it the driver path wins on fixed latency.  2M rows keeps
# worst-case driver residency ~300MB (the 128M-turn smoke measured the
# old 10M bound letting ~6.4M rows + joins reach ~GBs of driver RSS).
DRIVER_MAX_UNKNOWNS = 2_000_000
KINDREC_BUCKETS = 256

_SUBJ_PRON_ARR = pa.array(list(R.SUBJ_PRONOUNS))

UNTYPED = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("sent_idx", pa.int32()), ("subj", pa.string()),
    ("surface", pa.string()),
    ("negated", pa.bool_()), ("in_question", pa.bool_()),
])

RECOVERED = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("sent_idx", pa.int32()), ("subj", pa.string()),
    ("surface", pa.string()), ("kind", pa.string()),
    ("round", pa.int32()),
])


def untyped_mentions_batch(batch: pa.Table) -> pa.Table:
    """Transcript batch → untyped-mention rows (vectorized RE2 behind the
    template's literal prefilter; pronoun subjects excluded, mirroring the
    template arms)."""
    sents = _explode_sentences(batch)
    text = sents.column("sent")
    cand = pc.indices_nonzero(pc.fill_null(
        pc.match_substring(text, R.MENTIONED_LITERAL), False))
    if len(cand) == 0:        # empty-take guard (pyarrow 16 flake class)
        return UNTYPED.empty_table()
    sub = text.take(cand).combine_chunks()
    ex = pc.extract_regex(sub, R.MENTIONED_RE)
    mask = pc.is_valid(ex)
    subj = pc.struct_field(ex, "subj")
    mask = pc.and_(mask, pc.invert(pc.fill_null(
        pc.is_in(subj, value_set=_SUBJ_PRON_ARR), False)))
    if not pc.any(mask).as_py():
        return UNTYPED.empty_table()
    local = pc.indices_nonzero(mask)
    idx = cand.take(local)
    neg, inq, *_rest = _attrs(sub.take(local))
    return pa.Table.from_arrays(
        [sents.column("conv_id").take(idx).cast(pa.string()),
         sents.column("turn_idx").take(idx).cast(pa.int32()),
         sents.column("sent_idx").take(idx).cast(pa.int32()),
         subj.take(local).cast(pa.string()),
         pc.struct_field(ex, "obj").take(local).cast(pa.string()),
         neg.cast(pa.bool_()), inq.cast(pa.bool_())],
        schema=UNTYPED)


def untyped_from_events(events: pa.Table) -> pa.Table:
    """Events batch → UNTYPED rows from the fused overlay events
    (obj_kind='unknown' — emitted by the SAME extraction map as the
    grammar events, so recovery costs no second text scan)."""
    if events.num_rows == 0 or events.num_columns == 0:
        return UNTYPED.empty_table()
    sub = events.filter(pc.equal(
        events.column("obj_kind").cast(pa.string()), R.UNKNOWN_KIND))
    if sub.num_rows == 0:
        return UNTYPED.empty_table()
    return pa.Table.from_arrays(
        [sub.column("conv_id").cast(pa.string()),
         sub.column("turn_idx").cast(pa.int32()),
         sub.column("sent_idx").cast(pa.int32()),
         sub.column("subj").cast(pa.string()),
         sub.column("obj").cast(pa.string()),
         sub.column("negated").cast(pa.bool_()),
         sub.column("in_question").cast(pa.bool_())],
        schema=UNTYPED)


_EVIDENCE = pa.schema([("conv_id", pa.string()), ("surface", pa.string()),
                       ("kind", pa.string())])


def evidence_batch(events: pa.Table) -> pa.Table:
    """Events batch → distinct (conv_id, surface, kind) evidence partial:
    subject slots (non-null, non-conv kind) + object slots (non-null).
    Untyped-mention overlay rows (obj_kind='unknown') contribute NO
    evidence — neither slot; the evidence universe is exactly the grammar
    arms (the SQL oracle's ev CTE)."""
    if events.num_rows == 0 or events.num_columns == 0:
        return _EVIDENCE.empty_table()
    events = events.filter(pc.not_equal(
        events.column("obj_kind").cast(pa.string()), R.UNKNOWN_KIND))
    if events.num_rows == 0:
        return _EVIDENCE.empty_table()
    conv = events.column("conv_id").cast(pa.string())
    parts = []
    sk = events.column("subj_kind").cast(pa.string())
    smask = pc.and_(pc.is_valid(events.column("subj")),
                    pc.invert(pc.is_in(sk, value_set=pa.array(
                        sorted(R.NONLINK_KINDS)))))
    if pc.any(smask).as_py():
        idx = pc.indices_nonzero(smask)
        parts.append(pa.table({
            "conv_id": conv.take(idx),
            "surface": events.column("subj").take(idx).cast(pa.string()),
            "kind": sk.take(idx)}))
    omask = pc.is_valid(events.column("obj"))
    if pc.any(omask).as_py():
        idx = pc.indices_nonzero(omask)
        parts.append(pa.table({
            "conv_id": conv.take(idx),
            "surface": events.column("obj").take(idx).cast(pa.string()),
            "kind": events.column("obj_kind").take(idx).cast(pa.string())}))
    if not parts:
        return _EVIDENCE.empty_table()
    return (pa.concat_tables(parts)
            .group_by(["conv_id", "surface", "kind"]).aggregate([]))


def _key_hash(conv, surface) -> np.ndarray:
    key = pc.binary_join_element_wise(
        pc.cast(conv, pa.string()), pc.cast(surface, pa.string()), "\x1f")
    return pd.util.hash_array(key.to_numpy(zero_copy_only=False))


def _local_kinds_broadcast(events_ds, unk: pa.Table) -> pa.Table:
    """Round-1 dictionary (conv_id, surface → min kind) via the
    broadcast-unknowns map-side filter: evidence batches emit only rows
    whose (conv_id, surface) hash is in the broadcast sorted key array."""
    keys = np.unique(_key_hash(unk.column("conv_id"),
                               unk.column("surface")))
    kref = ray.put(keys)

    def cand(ev: pa.Table) -> pa.Table:
        t = evidence_batch(ev)
        if t.num_rows == 0:
            return _EVIDENCE.empty_table()
        ks = ray.get(kref)
        h = _key_hash(t.column("conv_id"), t.column("surface"))
        pos = np.searchsorted(ks, h)
        hit = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == h)
        if not hit.any():
            return _EVIDENCE.empty_table()
        return t.filter(pa.array(hit))

    parts = [b for b in events_ds.map_batches(
        cand, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        if b.num_columns and b.num_rows]
    if not parts:
        return _EVIDENCE.empty_table()
    allc = pa.concat_tables(parts).combine_chunks()
    return (allc.group_by(["conv_id", "surface"])
            .aggregate([("kind", "min")])
            .rename_columns(["conv_id", "surface", "kind"]))


def _stage_schema(extra: list[tuple[str, "pa.DataType"]]) -> pa.Schema:
    return pa.schema([(f.name, f.type) for f in UNTYPED] + extra)


def recover_distributed(events_ds,
                        n_buckets: int = KINDREC_BUCKETS,
                        stage1_ds: "ray.data.Dataset | None" = None
                        ) -> "ray.data.Dataset":
    """Fully distributed recovery — the beyond-broadcast path: NO driver
    state at any point (the unknown-mention set is corpus-proportional,
    ~5% of turns, so at 10^12-turn scale it must never be collected).
    Two narrow keyed exchanges, each carrying the unknown rows' full
    payload through a hash-bucketed shard join (the
    ``materialize._cogroup_resolve_pass`` discipline):

      1. conv-bucket: unknown rows + per-batch (conv_id, surface, kind)
         evidence partials co-locate by hash(conv_id); each shard builds
         the conv-local min-kind dict and LEFT-joins it onto its unknown
         rows (k1).
      2. surface-bucket: stage-1 rows + (surface, kind) evidence partials
         co-locate by hash(surface); each shard attaches the global
         min-kind (k2) and emits the final RECOVERED rows
         (kind = coalesce(k1, k2, 'unknown'), round 1/2/0).

    Equivalence with the driver path is pytest-asserted."""
    s1_in = _stage_schema([("kind", pa.string()), ("bucket", pa.int32())])
    s1_out = _stage_schema([("k1", pa.string())])
    s2_in = _stage_schema([("k1", pa.string()), ("kind", pa.string()),
                           ("bucket", pa.int32())])
    unt_names = [f.name for f in UNTYPED]

    # both exchanges ship their string columns as dictionary indices
    # (surfaces/kinds are vocabulary-drawn, conv_id block-repetitive —
    # the extract._encode_narrow discipline); shards decode once.  Every
    # return path of a tag fn encodes (incl. empty tables) so all blocks
    # of one exchange share the dictionary-typed schema.
    def _enc(t: pa.Table, names: tuple[str, ...]) -> pa.Table:
        # combine first — a chunked dict column ships one dictionary
        # copy per chunk (see extract._encode_narrow)
        t = t.combine_chunks()
        for name in names:
            i = t.schema.get_field_index(name)
            t = t.set_column(i, name,
                             pc.dictionary_encode(t.column(name)))
        return t

    _S1_DICT = ("conv_id", "subj", "surface", "kind")
    _S2_DICT = ("conv_id", "subj", "surface", "k1", "kind")

    def _bucket_conv(conv) -> pa.Array:
        h = pd.util.hash_array(pc.cast(conv, pa.string())
                               .to_numpy(zero_copy_only=False))
        return pa.array((h % n_buckets).astype("int32"))

    def tag_ev1(ev: pa.Table) -> pa.Table:
        t = evidence_batch(ev)
        if t.num_rows == 0:
            return _enc(s1_in.empty_table(), _S1_DICT)
        n = t.num_rows
        return _enc(pa.Table.from_arrays(
            [t.column("conv_id"),
             pa.nulls(n, pa.int32()), pa.nulls(n, pa.int32()),
             pa.nulls(n, pa.string()),
             t.column("surface"),
             pa.nulls(n, pa.bool_()), pa.nulls(n, pa.bool_()),
             t.column("kind"), _bucket_conv(t.column("conv_id"))],
            schema=s1_in), _S1_DICT)

    def tag_unk1(ev: pa.Table) -> pa.Table:
        t = untyped_from_events(ev)
        if t.num_rows == 0:
            return _enc(s1_in.empty_table(), _S1_DICT)
        t = t.append_column("kind", pa.nulls(t.num_rows, pa.string()))
        return _enc(
            t.append_column("bucket", _bucket_conv(t.column("conv_id"))),
            _S1_DICT)

    def shard1(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return s1_out.empty_table()
        g = _decode_narrow(g.drop_columns(["bucket"])).combine_chunks()
        # evidence rows carry kind; unknown rows carry turn_idx
        is_ev = pc.is_valid(g.column("kind"))
        unks = g.filter(pc.invert(is_ev)).select(unt_names)
        if unks.num_rows == 0:
            return s1_out.empty_table()
        evs = g.filter(is_ev)
        if evs.num_rows == 0:
            return unks.append_column(
                "k1", pa.nulls(unks.num_rows, pa.string()))
        d = (evs.select(["conv_id", "surface", "kind"])
             .group_by(["conv_id", "surface"])
             .aggregate([("kind", "min")])
             .rename_columns(["conv_id", "surface", "k1"]))
        out = unks.join(d, keys=["conv_id", "surface"],
                        join_type="left outer")
        return pa.Table.from_arrays(
            [out.column(n) for n in unt_names] + [out.column("k1")],
            schema=s1_out)

    def _bucket_surface(surface) -> pa.Array:
        return pa.array((_surface_hash(surface) % n_buckets)
                        .astype("int32"))

    def tag_ev2(ev: pa.Table) -> pa.Table:
        t = evidence_batch(ev)
        if t.num_rows == 0:
            return _enc(s2_in.empty_table(), _S2_DICT)
        t = (t.select(["surface", "kind"])
             .group_by(["surface", "kind"]).aggregate([]))
        n = t.num_rows
        return _enc(pa.Table.from_arrays(
            [pa.nulls(n, pa.string()),
             pa.nulls(n, pa.int32()), pa.nulls(n, pa.int32()),
             pa.nulls(n, pa.string()),
             t.column("surface"),
             pa.nulls(n, pa.bool_()), pa.nulls(n, pa.bool_()),
             pa.nulls(n, pa.string()), t.column("kind"),
             _bucket_surface(t.column("surface"))],
            schema=s2_in), _S2_DICT)

    def tag_unk2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _enc(s2_in.empty_table(), _S2_DICT)
        t = t.append_column("kind", pa.nulls(t.num_rows, pa.string()))
        return _enc(t.append_column(
            "bucket", _bucket_surface(t.column("surface"))), _S2_DICT)

    def shard2(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return RECOVERED.empty_table()
        g = _decode_narrow(g.drop_columns(["bucket"])).combine_chunks()
        # evidence rows carry kind; unknown rows carry conv_id
        is_ev = pc.is_valid(g.column("kind"))
        unks = g.filter(pc.invert(is_ev)).select(unt_names + ["k1"])
        if unks.num_rows == 0:
            return RECOVERED.empty_table()
        evs = g.filter(is_ev)
        if evs.num_rows:
            d = (evs.select(["surface", "kind"]).group_by("surface")
                 .aggregate([("kind", "min")])
                 .rename_columns(["surface", "k2"]))
            unks = unks.join(d, keys=["surface"], join_type="left outer")
        else:
            unks = unks.append_column(
                "k2", pa.nulls(unks.num_rows, pa.string()))
        k1 = unks.column("k1").combine_chunks()
        k2 = unks.column("k2").combine_chunks()
        kind = pc.coalesce(k1, k2, pa.scalar(R.UNKNOWN_KIND, pa.string()))
        rnd = pc.if_else(
            pc.is_valid(k1), pa.scalar(1, pa.int32()),
            pc.if_else(pc.is_valid(k2), pa.scalar(2, pa.int32()),
                       pa.scalar(0, pa.int32())))
        return pa.Table.from_arrays(
            [unks.column(n).cast(t) for n, t in
             [("conv_id", pa.string()), ("turn_idx", pa.int32()),
              ("sent_idx", pa.int32()), ("subj", pa.string()),
              ("surface", pa.string())]] + [kind.cast(pa.string()), rnd],
            schema=RECOVERED)

    # stage1_ds short-circuits the conv-bucket exchange: the fused
    # resolve+recovery path (extract_with_recovery) piggybacks stage 1 on
    # the resolver's conv-hash exchange and hands the s1_out rows here
    if stage1_ds is not None:
        stage1 = stage1_ds
    else:
        stage1 = (events_ds.map_batches(tag_ev1, batch_format="pyarrow")
                  .union(events_ds.map_batches(tag_unk1,
                                               batch_format="pyarrow"))
                  .groupby("bucket").map_groups(shard1,
                                                batch_format="pyarrow"))
    stage2 = (events_ds.map_batches(tag_ev2, batch_format="pyarrow")
              .union(stage1.map_batches(tag_unk2,
                                        batch_format="pyarrow"))
              .groupby("bucket").map_groups(shard2,
                                            batch_format="pyarrow"))
    return stage2


_GLOBAL_DICT = pa.schema([("surface", pa.string()), ("kind", pa.string())])


def _surface_hash(surface) -> "np.ndarray":
    return pd.util.hash_array(
        pc.cast(surface, pa.string()).to_numpy(zero_copy_only=False))


def _global_kinds_broadcast(events_ds, unk: pa.Table) -> pa.Table:
    """Round-2 dictionary (surface → corpus-wide min kind), restricted to
    the surfaces that actually appear among the unknowns: their hash set
    broadcasts once and evidence batches filter themselves map-side —
    the full vocabulary is never built, and the driver holds at most a
    few rows per unknown surface."""
    keys = np.unique(_surface_hash(unk.column("surface")))
    kref = ray.put(keys)

    def cand(ev: pa.Table) -> pa.Table:
        t = evidence_batch(ev)
        if t.num_rows == 0:
            return _GLOBAL_DICT.empty_table()
        ks = ray.get(kref)
        h = _surface_hash(t.column("surface"))
        pos = np.searchsorted(ks, h)
        hit = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == h)
        if not hit.any():
            return _GLOBAL_DICT.empty_table()
        return (t.filter(pa.array(hit)).select(["surface", "kind"])
                .group_by(["surface", "kind"]).aggregate([]))

    parts = [b for b in events_ds.map_batches(
        cand, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        if b.num_columns and b.num_rows]
    if not parts:
        return _GLOBAL_DICT.empty_table()
    return (pa.concat_tables(parts).combine_chunks()
            .group_by("surface").aggregate([("kind", "min")])
            .rename_columns(["surface", "kind"]))


def recover(transcripts_ds, events_ds=None, *,
            strategy: str = "auto") -> pa.Table:
    """Run the 2-round kind recovery; returns the RECOVERED Arrow table
    (one row per untyped mention; the set is a small fraction of turns —
    driver-held like the entity directory, with the same documented
    bounds).  strategy: 'auto' | 'broadcast' | 'cogroup' for round 1."""
    from . import extract as X

    if events_ds is None:
        events_ds = transcripts_ds.map_batches(
            X.extract_events, batch_format="pyarrow",
            zero_copy_batch=True).materialize()
    unk_ds = events_ds.map_batches(
        untyped_from_events, batch_format="pyarrow").materialize()
    parts = [b for b in unk_ds.iter_batches(batch_format="pyarrow")
             if b.num_columns and b.num_rows]
    if not parts:
        return RECOVERED.empty_table()
    unk = pa.concat_tables(parts).combine_chunks()

    if strategy == "auto":
        strategy = ("broadcast" if unk.num_rows <= DRIVER_MAX_UNKNOWNS
                    else "cogroup")
    if strategy == "cogroup":
        # fully distributed chain, collected only because this entry
        # point returns a driver table (query/tests); the headline build
        # consumes the Dataset directly (recovered_triples)
        out = [b for b in recover_distributed(events_ds)
               .iter_batches(batch_format="pyarrow")
               if b.num_columns and b.num_rows]
        return (pa.concat_tables(out).combine_chunks() if out
                else RECOVERED.empty_table())
    local = _local_kinds_broadcast(events_ds, unk)
    glob = _global_kinds_broadcast(events_ds, unk)

    j = unk.join(local.rename_columns(["conv_id", "surface", "k1"]),
                 keys=["conv_id", "surface"], join_type="left outer")
    j = j.join(glob.rename_columns(["surface", "k2"]),
               keys=["surface"], join_type="left outer")
    k1, k2 = j.column("k1"), j.column("k2")
    kind = pc.coalesce(k1, k2, pa.scalar(R.UNKNOWN_KIND, pa.string()))
    rnd = pc.if_else(pc.is_valid(k1), pa.scalar(1, pa.int32()),
                     pc.if_else(pc.is_valid(k2), pa.scalar(2, pa.int32()),
                                pa.scalar(0, pa.int32())))
    return pa.Table.from_arrays(
        [j.column(n).cast(t) for n, t in
         [("conv_id", pa.string()), ("turn_idx", pa.int32()),
          ("sent_idx", pa.int32()), ("subj", pa.string()),
          ("surface", pa.string())]] +
        [kind.cast(pa.string()), rnd],
        schema=RECOVERED)


def recovered_to_surface(rec: pa.Table) -> pa.Table:
    """RECOVERED rows → TRIPLES_SURFACE rows (pred='mentioned', obj_kind =
    the recovered kind); round-0 (unrecovered stub) rows are DROPPED."""
    rec = rec.filter(pc.greater(rec.column("round"), 0))
    n = rec.num_rows
    if n == 0:
        return S.TRIPLES_SURFACE.empty_table()
    return pa.Table.from_arrays(
        [rec.column("conv_id"), rec.column("turn_idx"),
         rec.column("subj"),
         pa.array([R.MENTIONED_PRED] * n, pa.string()),
         rec.column("surface"),
         pa.array(["person"] * n, pa.string()),
         rec.column("kind"),
         rec.column("sent_idx"),
         pa.array([False] * n, pa.bool_()),
         pa.array([False] * n, pa.bool_()),
         # 'mentioned' is intrinsically past (rules.PAST_RE), simple
         # aspect (no auxiliary verb group in the template), no
         # temporal adjunct (v33: the template accepts no since-suffix)
         pa.array([True] * n, pa.bool_()),
         pa.array([R.ASPECT_SIMPLE] * n, pa.string()),
         pa.nulls(n, pa.int32()),
         pa.array([False] * n, pa.bool_()),     # hedged (v36): never
         pa.array([0] * n, pa.int32()),
         pa.array([R.DEFAULT_CLAUSE] * n, pa.string())],
        schema=S.TRIPLES_SURFACE)


def recovered_triples(transcripts_ds, events_ds=None) -> "ray.data.Dataset":
    """Recovered mentions as TRIPLES_SURFACE rows (pred='mentioned',
    obj_kind = the recovered kind) — the rewrite-before-canonicalization
    step: these rows feed canonical_triples (where the normal
    normalize+link pipeline assigns ids/canonicals) but never the surface
    grammar stream or the entity vocabulary (recovery requires an
    existing typed mention of the same surface, so the (kind, norm) key
    is already in the directory).  Unrecovered mentions (round 0) are
    DROPPED — the stub-without-evidence case.

    Dispatch: below DRIVER_MAX_UNKNOWNS the driver path (fixed-latency
    win); above it the result STREAMS from the fully distributed chain —
    no corpus-proportional driver state ever (the 128M-turn smoke caught
    the old always-collect shape at ~GBs of driver RSS)."""
    from . import extract as X

    to_surface = recovered_to_surface

    if events_ds is None:
        events_ds = transcripts_ds.map_batches(
            X.extract_events, batch_format="pyarrow",
            zero_copy_batch=True).materialize()
    n_unk = events_ds.map_batches(
        untyped_from_events, batch_format="pyarrow").count()
    if n_unk > DRIVER_MAX_UNKNOWNS:
        return recover_distributed(events_ds).map_batches(
            to_surface, batch_format="pyarrow")
    return ray.data.from_arrow(
        to_surface(recover(transcripts_ds, events_ds)))


# ---------------------------------------------------------------------------
# Fused resolve + recovery-stage-1 exchange (the round-4 scaling lever):
# kindrec stage 1 co-locates by hash(conv_id) — the SAME key as the pronoun
# resolver's bucketed exchange — so its evidence partials and unknown rows
# ride the resolver exchange as tagged extra rows instead of paying their
# own all-to-all.  One events pass emits all three row classes; one
# map_groups runs both shard kernels; the materialized fused output is
# split by tag with two cheap filter maps.  Headline savings vs the
# separate chain: the untyped-count dispatch pass, the tag_ev1/tag_unk1
# events passes, and one full keyed exchange.  Stage 2 (surface-keyed,
# a different key) is unchanged and reached via
# ``recover_distributed(stage1_ds=...)``.

# input-row tags on the fused exchange (plain int8, rides beside the
# dictionary-encoded narrow columns): 0 = resolver row (the untouched
# _resolve_subset_plain semantics), 1 = evidence partial, 2 = unknown
# mention.  Output tags: 0 = resolved TRIPLES_SURFACE row, 1 = stage-1
# (UNTYPED + k1) row packed into the triples columns (subj=subject,
# obj=surface, pred=k1).
_KTAG = "ktag"


def _fused_out_schema() -> pa.Schema:
    return pa.schema([(f.name, f.type) for f in S.TRIPLES_SURFACE] +
                     [(_KTAG, pa.int8())])


def _narrow_from_evidence(ev_t: pa.Table) -> pa.Table:
    """_EVIDENCE rows → the plain narrow resolve schema (surface rides the
    obj column, kind rides obj_kind; everything else null)."""
    n = ev_t.num_rows
    snull = pa.nulls(n, pa.string())
    inull = pa.nulls(n, pa.int32())
    bnull = pa.nulls(n, pa.bool_())
    return pa.table({
        "conv_id": ev_t.column("conv_id").cast(pa.string()),
        "turn_idx": inull, "person": snull, "pred": snull,
        "obj": ev_t.column("surface").cast(pa.string()),
        "obj_kind": ev_t.column("kind").cast(pa.string()),
        "sent_idx": inull, "negated": bnull, "in_question": bnull,
        "is_past": bnull, "aspect": snull, "since_year": inull,
        "hedged": bnull,
        "slot_idx": inull, "clause": snull, "desc_key": snull})


def _narrow_from_unknowns(unk_t: pa.Table) -> pa.Table:
    """UNTYPED rows → the plain narrow resolve schema (subject rides the
    person column, surface rides obj)."""
    n = unk_t.num_rows
    snull = pa.nulls(n, pa.string())
    return pa.table({
        "conv_id": unk_t.column("conv_id").cast(pa.string()),
        "turn_idx": unk_t.column("turn_idx").cast(pa.int32()),
        "person": unk_t.column("subj").cast(pa.string()),
        "pred": snull,
        "obj": unk_t.column("surface").cast(pa.string()),
        "obj_kind": snull,
        "sent_idx": unk_t.column("sent_idx").cast(pa.int32()),
        "negated": unk_t.column("negated").cast(pa.bool_()),
        "in_question": unk_t.column("in_question").cast(pa.bool_()),
        "is_past": pa.nulls(n, pa.bool_()),
        "aspect": snull,
        "since_year": pa.nulls(n, pa.int32()),
        "hedged": pa.nulls(n, pa.bool_()),
        "slot_idx": pa.nulls(n, pa.int32()),
        "clause": snull, "desc_key": snull})


def _fused_tag(t: pa.Table, n_buckets: int) -> pa.Table:
    """One events pass → all three tagged row classes of the fused
    exchange, encoded/bucketed once (the _encode_narrow discipline)."""
    from . import extract as X

    res = X._resolve_subset_plain(t)
    ev = _narrow_from_evidence(evidence_batch(t))
    unk = _narrow_from_unknowns(untyped_from_events(t))
    tags = pa.concat_arrays([
        pa.array(np.zeros(res.num_rows, dtype=np.int8), pa.int8()),
        pa.array(np.ones(ev.num_rows, dtype=np.int8), pa.int8()),
        pa.array(np.full(unk.num_rows, 2, dtype=np.int8), pa.int8())])
    plain = (pa.concat_tables([res, ev, unk])
             .append_column(_KTAG, tags))
    return X._encode_narrow(X._with_bucket(plain, n_buckets))


def _fused_shard(g: pa.Table, cap: int | None) -> pa.Table:
    """Per-bucket kernel: the resolver kernel over tag-0 rows + the
    stage-1 conv-local min-kind join over tag-1/2 rows."""
    from . import extract as X

    out_schema = _fused_out_schema()
    if g.num_rows == 0:
        return out_schema.empty_table()
    ktag = g.column(_KTAG)
    outs = []
    res = g.filter(pc.equal(ktag, 0)).drop_columns([_KTAG])
    tri = X._resolve_bucket(res, cap)
    if tri.num_rows:
        outs.append(tri.append_column(
            _KTAG, pa.array(np.zeros(tri.num_rows, dtype=np.int8),
                            pa.int8())))
    unk = g.filter(pc.equal(ktag, 2))
    if unk.num_rows:
        unkd = _decode_narrow(
            unk.drop_columns(["bucket", _KTAG])).combine_chunks()
        evd = _decode_narrow(g.filter(pc.equal(ktag, 1))
                             .drop_columns(["bucket", _KTAG])) \
            .combine_chunks()
        if evd.num_rows:
            d = (evd.select(["conv_id", "obj", "obj_kind"])
                 .group_by(["conv_id", "obj"])
                 .aggregate([("obj_kind", "min")])
                 .rename_columns(["conv_id", "obj", "k1"]))
            j = unkd.join(d, keys=["conv_id", "obj"],
                          join_type="left outer")
        else:
            j = unkd.append_column(
                "k1", pa.nulls(unkd.num_rows, pa.string()))
        n = j.num_rows
        outs.append(pa.Table.from_arrays(
            [j.column("conv_id").cast(pa.string()),
             j.column("turn_idx").cast(pa.int32()),
             j.column("person").cast(pa.string()),     # mention subject
             j.column("k1").cast(pa.string()),         # k1 rides pred
             j.column("obj").cast(pa.string()),        # surface
             pa.nulls(n, pa.string()), pa.nulls(n, pa.string()),
             j.column("sent_idx").cast(pa.int32()),
             j.column("negated").cast(pa.bool_()),
             j.column("in_question").cast(pa.bool_()),
             pa.nulls(n, pa.bool_()), pa.nulls(n, pa.string()),
             pa.nulls(n, pa.int32()),                 # since_year (v33)
             pa.nulls(n, pa.bool_()),                 # hedged (v36)
             pa.nulls(n, pa.int32()), pa.nulls(n, pa.string()),
             pa.array(np.ones(n, dtype=np.int8), pa.int8())],
            schema=out_schema))
    if not outs:
        return out_schema.empty_table()
    return pa.concat_tables(outs)


def _fused_triples(t: pa.Table) -> pa.Table:
    return (t.filter(pc.equal(t.column(_KTAG), 0))
            .drop_columns([_KTAG]).cast(S.TRIPLES_SURFACE))


def _fused_s1(t: pa.Table) -> pa.Table:
    sub = t.filter(pc.equal(t.column(_KTAG), 1))
    return pa.Table.from_arrays(
        [sub.column("conv_id"), sub.column("turn_idx"),
         sub.column("sent_idx"),
         sub.column("subj"),        # mention subject
         sub.column("obj"),         # surface
         sub.column("negated"), sub.column("in_question"),
         sub.column("pred")],       # k1
        schema=_stage_schema([("k1", pa.string())]))


def extract_with_recovery(transcripts_ds, *,
                          resolve_buckets: int | None = None,
                          max_resolve_events_per_conv: int | None = None):
    """Headline-build extraction with the kind-recovery stage-1 exchange
    FUSED into the resolver exchange.  Returns
    ``(triples_surface_ds, events_ds, recovered_surface_ds)`` —
    semantically identical to ``extract_triples_and_events`` +
    ``recovered_triples`` (equivalence pytest-asserted) with two fewer
    events passes and one fewer keyed exchange."""
    from . import extract as X

    if resolve_buckets is None:
        resolve_buckets = X.DEFAULT_RESOLVE_BUCKETS
    events = transcripts_ds.map_batches(
        X.extract_events, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    passthrough = events.map_batches(X._passthrough_triples,
                                     batch_format="pyarrow")
    cap = (X.MAX_RESOLVE_EVENTS_PER_CONV
           if max_resolve_events_per_conv is None
           else max_resolve_events_per_conv)
    fused = (events.map_batches(
        lambda t: _fused_tag(t, resolve_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: _fused_shard(g, cap),
                    batch_format="pyarrow")
        .materialize())
    resolved = fused.map_batches(_fused_triples, batch_format="pyarrow")
    s1 = fused.map_batches(_fused_s1, batch_format="pyarrow")
    recovered = recover_distributed(events, stage1_ds=s1)
    rec_surface = recovered.map_batches(recovered_to_surface,
                                        batch_format="pyarrow")
    return passthrough.union(resolved), events, rec_surface


def kind_recovery_query(sf_dir: str):
    """(conv_id, turn_idx, sent_idx, subj, surface, kind, round) for every
    untyped mention in the corpus."""
    from .. import synth
    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir),
                                columns=["conv_id", "turn_idx", "role",
                                         "text", "tool"])
    return ray.data.from_arrow(recover(tds))


def kind_recovery_sql(tr: str) -> str:
    """DuckDB mirror: same two CTE rounds over the shared events arms."""
    from ..extract import sqlgen as G

    rxs = R.MENTIONED_RE
    import re as _re
    rx_plain = _re.sub(r"\(\?P<[a-z0-9]+>", "(", rxs).replace("'", "''")
    pron_in = ", ".join(f"'{p}'" for p in R.SUBJ_PRONOUNS)
    sents = G._sents_cte(tr)
    nonlink_in = ", ".join(f"'{k}'" for k in sorted(R.NONLINK_KINDS))
    return f"""
    WITH ev0 AS ({G.events_sql(tr)}),
    ev AS (
      SELECT conv_id, subj AS surface, subj_kind AS kind FROM ev0
      WHERE subj IS NOT NULL AND subj_kind NOT IN ({nonlink_in})
      UNION ALL
      SELECT conv_id, obj, obj_kind FROM ev0 WHERE obj IS NOT NULL),
    unk AS (
      SELECT conv_id, turn_idx, sent_idx,
             regexp_extract(sent, '{rx_plain}', 1) AS subj,
             regexp_extract(sent, '{rx_plain}', 2) AS surface
      FROM {sents}
      WHERE regexp_matches(sent, '{rx_plain}')
        AND regexp_extract(sent, '{rx_plain}', 1) NOT IN ({pron_in})),
    loc AS (SELECT conv_id, surface, min(kind) AS k
            FROM ev GROUP BY 1, 2),
    gdict AS (SELECT surface, min(kind) AS k FROM ev GROUP BY 1)
    SELECT u.conv_id, u.turn_idx, u.sent_idx, u.subj, u.surface,
           coalesce(l.k, g.k, '{R.UNKNOWN_KIND}') AS kind,
           CAST(CASE WHEN l.k IS NOT NULL THEN 1
                     WHEN g.k IS NOT NULL THEN 2
                     ELSE 0 END AS INTEGER) AS round
    FROM unk u
    LEFT JOIN loc l ON l.conv_id = u.conv_id AND l.surface = u.surface
    LEFT JOIN gdict g ON g.surface = u.surface
    """
