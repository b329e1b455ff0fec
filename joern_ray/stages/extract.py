"""Turn-level extraction stages (the per-unit parse of SURVEY.md §3.1).

Stage A (``extract_events``) is a pure vectorized ``map_batches`` over raw
transcript batches: all template regexes run as RE2 kernels
(``pyarrow.compute.extract_regex``) — no Python loop over rows, no shuffle,
and the wide ``text`` column never leaves this stage (SURVEY.md §7 hard part
5: shuffle keys, not payloads).  Reference analog: the per-file
AstCreationPass (``c2cpg/passes/AstCreationPass.scala:20-77``).

Stage B (``resolve_triples``) shuffles only the *small* event rows with
``groupby(conv_id).map_groups`` and resolves pronoun references under stable
``turn_idx`` ordering — the conversation-local enrichment analog of the
CFG/REACHING_DEF passes (conversation == method: group-local state, no
distributed fixpoint; SURVEY.md §2.10).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as S
from ..functions import rules as R

_PRONOUN_SET = pa.array(list(R.PRONOUNS))

# cheap literal prefilters (memchr scan) run before each RE2 kernel so the
# regex engine only sees candidate rows — "prune at the read" applied to
# the hot extraction loop.  Literal must be implied by the template regex.
_TEMPLATE_LITERALS = {
    "works_at": " works at ",
    "reported_bug": " reported a bug in ",
    "uses": " uses ",
    "acquired": " acquired ",
    "met": " met with ",
}


def _events_table(n: int, conv, turn_idx, etype, subj, pred, obj, sk, ok) -> pa.Table:
    def col(v, typ):
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            return v.cast(typ) if v.type != typ else v
        return pa.array([v] * n, type=typ)
    return pa.Table.from_arrays(
        [col(conv, pa.string()), col(turn_idx, pa.int32()),
         col(etype, pa.string()), col(subj, pa.string()),
         col(pred, pa.string()), col(obj, pa.string()),
         col(sk, pa.string()), col(ok, pa.string())],
        schema=S.EVENTS)


def extract_events(batch: pa.Table) -> pa.Table:
    """Stage A: transcript batch → extraction-event rows (vectorized)."""
    batch = batch.combine_chunks()
    text = batch.column("text")
    conv = batch.column("conv_id")
    tidx = batch.column("turn_idx")
    outs: list[pa.Table] = []

    # tool-invocation facts come from metadata columns, not text
    tool_mask = pc.and_kleene(pc.equal(batch.column("role"), "tool"),
                              pc.is_valid(batch.column("tool")))
    tool_mask = pc.fill_null(tool_mask, False)
    if pc.any(tool_mask).as_py():
        sub = batch.filter(tool_mask)
        outs.append(_events_table(
            sub.num_rows, sub.column("conv_id"), sub.column("turn_idx"),
            "triple", sub.column("conv_id"), R.INVOKED_PRED,
            sub.column("tool"), "conv", "tool"))

    import numpy as np

    # pronoun templates first (their sentences also match the person-subject
    # shape; the oracle applies the same precedence)
    pron_pre = pc.or_(pc.starts_with(text, "She "),
                      pc.starts_with(text, "He "))
    pron_idx = pc.indices_nonzero(pc.fill_null(pron_pre, False))
    pron_text = text.take(pron_idx)
    pron_matched_np = np.zeros(batch.num_rows, dtype=bool)
    for pred, rx, ok in R.PRONOUN_TEMPLATES:
        ex = pc.extract_regex(pron_text, rx)
        mask = pc.is_valid(ex)
        if not pc.any(mask).as_py():
            continue
        local = pc.indices_nonzero(mask)
        idx = pron_idx.take(local)
        pron_matched_np[idx.to_numpy(zero_copy_only=False)] = True
        outs.append(_events_table(
            len(idx), conv.take(idx), tidx.take(idx), "pronoun",
            pa.array([None] * len(idx), pa.string()), pred,
            pc.struct_field(ex, "obj").take(local), "person", ok))

    for pred, rx, sk, ok in R.TEMPLATES:
        pre = pc.match_substring(text, _TEMPLATE_LITERALS[pred])
        idx0 = pc.indices_nonzero(pc.fill_null(pre, False))
        if len(idx0) == 0:
            continue
        sub = text.take(idx0)
        ex = pc.extract_regex(sub, rx)
        mask = pc.is_valid(ex)
        subj = pc.struct_field(ex, "subj")
        not_pron = pc.invert(pc.fill_null(
            pc.is_in(subj, value_set=_PRONOUN_SET), False))
        not_pm = pc.invert(pa.array(
            pron_matched_np[idx0.to_numpy(zero_copy_only=False)]))
        mask = pc.and_(pc.and_(mask, not_pron), not_pm)
        if not pc.any(mask).as_py():
            continue
        local = pc.indices_nonzero(mask)
        idx = idx0.take(local)
        outs.append(_events_table(
            len(idx), conv.take(idx), tidx.take(idx), "triple",
            subj.take(local), pred,
            pc.struct_field(ex, "obj").take(local), sk, ok))

    if not outs:
        return S.EVENTS.empty_table()
    return pa.concat_tables(outs)


def _resolve_group(group: pa.Table) -> pa.Table:
    """Stage B group fn: one conversation's events, any order in, surface
    triples out (pronouns resolved under stable turn ordering)."""
    group = group.sort_by([("turn_idx", "ascending")])
    etypes = group.column("etype")
    has_pronoun = pc.any(pc.equal(etypes, "pronoun")).as_py()
    if not has_pronoun:
        return group.drop_columns(["etype"])
    rows = group.to_pylist()
    keep: list[dict] = []
    last_person: str | None = None
    for r in rows:
        if r["etype"] == "pronoun":
            if last_person is not None:
                r = dict(r, subj=last_person)
                keep.append(r)
            continue
        keep.append(r)
        if r["obj_kind"] == "person":
            last_person = r["obj"]
        elif r["subj_kind"] == "person":
            last_person = r["subj"]
    if not keep:
        return S.TRIPLES_SURFACE.empty_table()
    t = pa.Table.from_pylist(keep, schema=S.EVENTS)
    return t.drop_columns(["etype"])


def _resolve_bucket(group: pa.Table,
                    cap: int | None = None) -> pa.Table:
    """Vectorized resolver for a BUCKET of whole conversations: sort by
    (conv_id, turn_idx), forward-fill each conversation's last person
    mention, substitute into pronoun rows.  Emits ONLY the resolved pronoun
    triples — non-pronoun triples take the shuffle-free passthrough in
    ``extract_triples``.  Input is the narrow ``_resolve_subset`` schema
    (state rows carry just the person value; pronoun rows carry the triple
    payload).  Semantics match ``_resolve_group`` (the per-conversation
    reference implementation, kept for tests) with the per-group overhead
    amortized across ~thousands of conversations."""
    import numpy as np
    import pandas as pd

    if group.num_rows == 0:
        return S.TRIPLES_SURFACE.empty_table()
    df = group.drop_columns(["bucket"]).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort",
                        ignore_index=True)
    # pathological-conversation bail-out (deterministic truncation)
    if cap is None:
        cap = MAX_RESOLVE_EVENTS_PER_CONV
    within = df.groupby(df["conv_id"].to_numpy(), sort=False).cumcount()
    if (within >= cap).any():
        df = df[within < cap].reset_index(drop=True)
    is_pron = df["pred"].notna().to_numpy()
    conv = df["conv_id"].to_numpy()
    s = pd.Series(df["person"].to_numpy(object), dtype=object)
    prev = s.groupby(conv, sort=False).shift(1)
    prev = prev.groupby(conv, sort=False).ffill()
    resolved = prev.to_numpy(object)
    keep = is_pron & ~pd.isna(resolved)
    out = df[keep]
    n = len(out)
    return pa.Table.from_arrays(
        [pa.array(out["conv_id"].to_numpy(object), pa.string()),
         pa.array(out["turn_idx"].to_numpy(), pa.int32()),
         pa.array(resolved[keep], pa.string()),
         pa.array(out["pred"].to_numpy(object), pa.string()),
         pa.array(out["obj"].to_numpy(object), pa.string()),
         pa.array(["person"] * n, pa.string()),
         pa.array(out["obj_kind"].to_numpy(object), pa.string())],
        schema=S.TRIPLES_SURFACE)


# Bucketed-resolve partitioning assumption: every conversation lands wholly
# in one bucket (hash(conv_id) % n), and one bucket's event rows fit a
# worker's heap.  Size n so total_events / n stays ≲ 1M rows; at 10^12-turn
# scale pass a proportionally larger n (events are ~40B/row, so 1M rows ≈
# 50 MB per group).
DEFAULT_RESOLVE_BUCKETS = 1024

# Bail-out guard (the 4000-defs dataflow cap analog,
# ``ReachingDefPass.scala:40-52`` / ``--max-num-def``): a pathological
# conversation contributes at most this many rows to the resolver — beyond
# it, later rows are dropped from RESOLUTION ONLY (their non-pronoun
# triples still flow through the passthrough), deterministically by
# turn order.
MAX_RESOLVE_EVENTS_PER_CONV = 100_000


def _with_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    import pandas as pd
    h = pd.util.hash_array(batch.column("conv_id").to_numpy(
        zero_copy_only=False))
    return batch.append_column(
        "bucket", pa.array((h % n_buckets).astype("int64")))


def _passthrough_triples(t: pa.Table) -> pa.Table:
    """Non-pronoun events are already final surface triples."""
    return t.filter(pc.equal(t.column("etype"), "triple")) \
            .drop_columns(["etype"])


def _resolve_subset(t: pa.Table, n_buckets: int) -> pa.Table:
    """Rows the resolver actually needs, projected to the narrow shuffle
    schema: pronoun events keep their triple payload (pred/obj/obj_kind);
    person-carrying triples collapse to a single ``person`` state value.
    Everything else skips the shuffle entirely, and no wide or redundant
    column ever enters it."""
    is_pron = pc.equal(t.column("etype"), "pronoun")
    person_val = pc.if_else(
        pc.equal(t.column("obj_kind"), "person"), t.column("obj"),
        pc.if_else(pc.equal(t.column("subj_kind"), "person"),
                   t.column("subj"), pa.nulls(t.num_rows, pa.string())))
    # pronoun rows never contribute state (resolution rule)
    person_val = pc.if_else(is_pron, pa.nulls(t.num_rows, pa.string()),
                            person_val)
    mask = pc.or_(is_pron, pc.is_valid(person_val))
    nulls = pa.nulls(t.num_rows, pa.string())
    narrow = pa.table({
        "conv_id": t.column("conv_id"),
        "turn_idx": t.column("turn_idx"),
        "person": person_val,
        "pred": pc.if_else(is_pron, t.column("pred"), nulls),
        "obj": pc.if_else(is_pron, t.column("obj"), nulls),
        "obj_kind": pc.if_else(is_pron, t.column("obj_kind"), nulls),
    }).filter(mask)
    return _with_bucket(narrow, n_buckets)


def extract_triples(transcripts_ds, *, num_partitions: int | None = None,
                    resolve_buckets: int | None = DEFAULT_RESOLVE_BUCKETS,
                    materialize_events: bool = True,
                    max_resolve_events_per_conv: int | None = None):
    """Full extraction: transcripts Dataset → surface-triples Dataset.

    resolve_buckets=None groups per conversation (reference semantics,
    higher per-group overhead; all events shuffled); an int routes only the
    pronoun-relevant subset through that many hash buckets, resolves each
    bucket vectorized, and unions with the shuffle-free passthrough.

    With materialize_events (default), events land in the object store once
    and BOTH branches read them; the resolved branch (small) is also
    materialized, so the returned triples Dataset is cheap to re-consume —
    callers should NOT materialize it again (the passthrough bulk would
    just be copied through the object store a second time)."""
    events = transcripts_ds.map_batches(
        extract_events, batch_format="pyarrow", zero_copy_batch=True)
    if resolve_buckets is None:
        return events.groupby("conv_id").map_groups(
            _resolve_group, batch_format="pyarrow")
    if materialize_events:
        events = events.materialize()  # consumed by both branches
    passthrough = events.map_batches(_passthrough_triples,
                                     batch_format="pyarrow")
    cap = (MAX_RESOLVE_EVENTS_PER_CONV
           if max_resolve_events_per_conv is None
           else max_resolve_events_per_conv)
    resolved = events.map_batches(
        lambda t: _resolve_subset(t, resolve_buckets),
        batch_format="pyarrow").groupby("bucket").map_groups(
        lambda g: _resolve_bucket(g, cap), batch_format="pyarrow")
    if materialize_events:
        resolved = resolved.materialize()
    return passthrough.union(resolved)
