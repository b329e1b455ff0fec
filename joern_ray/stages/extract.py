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

# the shared subject-slot pronoun surface set (rules.SUBJ_PRONOUNS —
# includes the v32 plural "They", so a plural pronoun captured by any
# non-plural template's person-subject slot stays a pronoun surface)
_PRONOUN_SET = pa.array(list(R.SUBJ_PRONOUNS))
# OBJECT-slot pronoun test (v25): adds the lowercase mid-sentence forms —
# subject slots never capture lowercase, so this set is object-only
_OBJ_PRONOUN_SET = pa.array(list(R.OBJ_PRONOUNS))

# cheap literal prefilters (memchr scan) run before each RE2 kernel so the
# regex engine only sees candidate rows — "prune at the read" applied to
# the hot extraction loop.  Literal must be implied by the template regex.
_TEMPLATE_LITERALS = {
    # v24/v27: tense- and aspect-alternated verbs keep the longest literal
    # common to ALL forms (' work' ⊂ works/worked/working; ' us' ⊂
    # uses/used/using; ' manag' ⊂ manages/managed/managing) —
    # implied-by-regex rule
    "works_at": " work",
    "reported_bug": " reported a bug in ",
    "uses": " us",
    # v35: the five aspect-extended intrinsically-past families shrink to
    # the longest form-common literal (' acquir' ⊂ acquired/acquiring;
    # ' me' ⊂ met/meeting; ' join' ⊂ joined/joining; ' le' ⊂
    # left/leaving; ' partner' ⊂ partnered/partnering)
    "acquired": " acquir",
    "met": " me",
    "joined": " join",
    "left_org": " le",
    "manages": " manag",
    "maintains": " maintain",
    "partnered": " partner",
}

# ONE any-literal scan (RE2 alternation of every template literal) gates the
# per-template prefilters: filler sentences (no literal at all, the majority
# of a conversational corpus) are touched once instead of once per template.
# Purely a candidate-set refinement — per-template logic is unchanged.
import re as _re  # noqa: E402

def _flat_literals(vals):
    """Tuple values are CONJUNCTIONS of prefilter literals (all must
    hit); for the any-literal gate each element is a sufficient
    candidate condition, so flatten them into the alternation."""
    for v in vals:
        if isinstance(v, tuple):
            yield from v
        else:
            yield v


_ANY_LITERAL_RE = "|".join(
    _re.escape(lit) for lit in _flat_literals(
        list(_TEMPLATE_LITERALS.values())
        + list(R.MULTI_TEMPLATE_LITERALS.values())
        + list(R.LIST_TEMPLATE_LITERALS.values())
        + [R.MENTIONED_LITERAL, R.DESC_LITERAL, R.DESC_OBJ_LITERAL,
           R.MGR_DESC_LITERAL, R.MGR_DESC_OBJ_LITERAL,
           R.DESC_ORG_LITERAL]))


def _events_table(n: int, conv, turn_idx, subj, pred, obj, sk, ok,
                  sent_idx=0, negated=False, in_question=False,
                  is_past=False, aspect=R.ASPECT_SIMPLE,
                  slot_idx=0, clause=R.DEFAULT_CLAUSE,
                  desc_key=None, since=None, hedged=False) -> pa.Table:
    """One template's matches as an EVENTS table.  subj=None rows are
    pronoun events (schema invariant — there is no etype column); the
    categorical pred/kind columns are dictionary-encoded so the
    materialized events store copy carries int32 indices, not repeated
    strings."""
    def col(v, typ):
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            return v.cast(typ) if v.type != typ else v
        return pa.array([v] * n, type=typ)

    def dcol(v):
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            if pa.types.is_dictionary(v.type):
                return v
            if v.type != pa.string():
                v = v.cast(pa.string())
            # NULL-bearing columns (subj/obj pronoun discriminators)
            # encode to null indices — the store invariant survives
            return pc.dictionary_encode(v).cast(S.EVENTS_DICT)
        if v is None:
            return pa.DictionaryArray.from_arrays(
                pa.nulls(n, pa.int32()), pa.array([], pa.string()))
        # scalar: n identical values = one dictionary entry, n zero indices
        return pa.DictionaryArray.from_arrays(
            pa.array([0] * n, pa.int32()), pa.array([v], pa.string()))
    return pa.Table.from_arrays(
        [col(conv, pa.string()), col(turn_idx, pa.int32()),
         dcol(subj), dcol(pred), dcol(obj),
         dcol(sk), dcol(ok),
         col(sent_idx, pa.int32()), col(negated, pa.bool_()),
         col(in_question, pa.bool_()), col(is_past, pa.bool_()),
         dcol(aspect),
         (pa.nulls(n, pa.int32()) if since is None
          else col(since, pa.int32())),
         col(hedged, pa.bool_()),
         col(slot_idx, pa.int32()), dcol(clause), dcol(desc_key)],
        schema=S.EVENTS)


def _explode_sentences(batch: pa.Table) -> pa.Table:
    """Turn rows → one row per sentence (vectorized: RE2 boundary-mark +
    split + list_flatten + quote-parity repair; the per-statement
    AST-visit analog of rules.split_sentences).  Output:
    (conv_id, turn_idx, sent, sent_idx).

    Fast path: rows WITHOUT a sentence boundary (the overwhelming
    majority) skip the rewrite/split/flatten entirely — one boundary scan
    decides, so multi-sentence support costs single-sentence rows one RE2
    pass instead of three allocations of the whole text column.  The
    parity repair (a part at odd preceding in-turn quote count merges
    into its predecessor — the v23 quote-aware contract in rules.py) is
    itself gated: corpora without in-quote boundaries skip it after one
    vectorized parity scan, and the merge is round-based
    ``binary_join_element_wise`` + ``replace_with_mask`` — no per-row
    Python."""
    import numpy as np

    text = batch.column("text")
    bnd = pc.fill_null(pc.match_substring_regex(text, R.SENT_MARK_RE), False)
    if not pc.any(bnd).as_py():
        return pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "sent": text,
            "sent_idx": pa.nulls(batch.num_rows, pa.int32()).fill_null(0),
        })
    multi_idx = pc.indices_nonzero(bnd)
    single_idx = pc.indices_nonzero(pc.invert(bnd))
    singles = []
    if len(single_idx):  # empty-subset guard (pyarrow 16 empty-take flake)
        singles.append(pa.table({
            "conv_id": batch.column("conv_id").take(single_idx),
            "turn_idx": batch.column("turn_idx").take(single_idx),
            "sent": text.take(single_idx),
            "sent_idx": pa.nulls(len(single_idx), pa.int32()).fill_null(0),
        }))
    mtext = text.take(multi_idx)
    marked = pc.replace_substring_regex(mtext, R.SENT_MARK_RE,
                                        R.SENT_MARK_SUB)
    parts = pc.split_pattern(marked, R.SENT_SPLIT)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(parts)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    # quote-parity repair (rules.py segmentation contract step 2): the
    # preceding in-turn double-quote count of each part decides whether
    # the mark before it was a real boundary (even) or sat inside an open
    # quotation (odd → merge back, restoring the consumed space)
    qc = pc.count_substring(flat, '"').to_numpy(zero_copy_only=False)
    cum = np.cumsum(qc) - qc                       # global exclusive cumsum
    new_turn = np.empty(len(parent), dtype=bool)
    new_turn[0] = True
    new_turn[1:] = parent[1:] != parent[:-1]
    # subtract each turn's base so cum is the in-turn exclusive count
    base = np.maximum.accumulate(np.where(new_turn, cum, 0))
    is_start = ((cum - base) % 2 == 0) | new_turn
    if not bool(is_start.all()):
        first = np.flatnonzero(is_start)           # first part per sentence
        sizes = np.diff(np.append(first, len(flat)))
        sent = flat.take(pa.array(first, pa.int64()))
        for k in range(1, int(sizes.max())):
            m = sizes > k
            joined = pc.binary_join_element_wise(
                sent.take(pa.array(np.flatnonzero(m), pa.int64())),
                flat.take(pa.array(first[m] + k, pa.int64())), " ")
            sent = pc.replace_with_mask(sent, pa.array(m), joined)
        flat, parent = sent, parent[first]
        new_turn = np.empty(len(parent), dtype=bool)
        new_turn[0] = True
        new_turn[1:] = parent[1:] != parent[:-1]
    pos = np.arange(len(parent), dtype=np.int64)
    sent_idx = pos - np.maximum.accumulate(np.where(new_turn, pos, 0))
    parent = pa.array(parent, pa.int64())
    multi = pa.table({
        "conv_id": batch.column("conv_id").take(multi_idx).take(parent),
        "turn_idx": batch.column("turn_idx").take(multi_idx).take(parent),
        "sent": flat,
        "sent_idx": pa.array(sent_idx.astype("int32"), pa.int32()),
    })
    return pa.concat_tables(singles + [multi])


def _attrs(sent) -> tuple:
    """(negated, in_question, is_past, aspect, since_year, hedged)
    attribute kernels over matched sentences.  is_past is the v24 lexical tense
    contract (rules.py): a word-bounded past-form verb token, minus the
    present-passive ('is maintained by') and present-perfect ('has
    worked', v27) carve-outs.  aspect is the v27 contract: progressive
    if PROG_RE, perfect if PERF_RE, else simple.  since_year is the v33
    temporal-adjunct contract: the int year of a sentence-final
    'since <year>', NULL when absent — the RE2 extract runs only on
    the ' since '-bearing subset (memchr prefilter, the
    template-literal discipline: almost no sentence carries the
    adjunct, so the hot path pays one substring scan, not a regex)."""
    if isinstance(sent, pa.ChunkedArray):
        sent = sent.combine_chunks()
    n = len(sent)
    s_mask = pc.fill_null(pc.match_substring(sent, " since "), False)
    s_idx = pc.indices_nonzero(s_mask)
    if len(s_idx):
        yr = pc.struct_field(
            pc.extract_regex(sent.take(s_idx), R.SINCE_RE),
            "year").cast(pa.int32())
        since_all = pc.replace_with_mask(pa.nulls(n, pa.int32()),
                                         s_mask, yr)
    else:
        since_all = pa.nulls(n, pa.int32())
    return (pc.match_substring(sent, R.NEGATION_MARK),
            pc.ends_with(sent, R.QUESTION_MARK),
            pc.and_(pc.and_(
                pc.match_substring_regex(sent, R.PAST_RE),
                pc.invert(pc.match_substring_regex(
                    sent, R.PRES_PASSIVE_RE))),
                pc.invert(pc.match_substring_regex(
                    sent, R.PRES_PERFECT_RE))),
            pc.if_else(
                pc.match_substring_regex(sent, R.PROG_RE),
                pa.scalar(R.ASPECT_PROG, pa.string()),
                pc.if_else(
                    pc.match_substring_regex(sent, R.PERF_RE),
                    pa.scalar(R.ASPECT_PERF, pa.string()),
                    pa.scalar(R.ASPECT_SIMPLE, pa.string()))),
            since_all,
            # v36 hedge attribute: the NEGATION_MARK substring discipline
            pc.match_substring(sent, R.HEDGE_MARK))


def extract_events(batch: pa.Table,
                   extra_templates: list[tuple] | None = None,
                   extra_multi_templates: list[tuple] | None = None
                   ) -> pa.Table:
    """Stage A: transcript batch → extraction-event rows (vectorized;
    multi-sentence turns explode first, every sentence matched
    independently — multiple events per turn are first-class).

    extra_templates: externally-loaded (pred, regex, subj_kind, obj_kind)
    rows (state.config.Semantics.templates — the extraFlows/semantics-file
    merge discipline, ``OssDataFlow.scala:15-18``), appended after the
    built-in pack."""
    batch = batch.combine_chunks()
    outs: list[pa.Table] = []

    # tool-invocation facts come from metadata columns, not text
    tool_mask = pc.and_kleene(pc.equal(batch.column("role"), "tool"),
                              pc.is_valid(batch.column("tool")))
    tool_mask = pc.fill_null(tool_mask, False)
    if pc.any(tool_mask).as_py():
        sub = batch.filter(tool_mask)
        outs.append(_events_table(
            sub.num_rows, sub.column("conv_id"), sub.column("turn_idx"),
            sub.column("conv_id"), R.INVOKED_PRED,
            sub.column("tool"), "conv", "tool"))

    import numpy as np

    sents = _explode_sentences(batch)
    text = sents.column("sent")
    conv = sents.column("conv_id")
    tidx = sents.column("turn_idx")
    sidx = sents.column("sent_idx")
    # attribute kernels ONCE over the whole sentence column; every
    # emission below takes its subset (previously recomputed per
    # emission — ~2x per multi-template with the pronoun branch)
    neg_all, inq_all, past_all, asp_all, snc_all, hed_all = _attrs(text)

    # pronoun templates first (their sentences also match the person-subject
    # shape; the oracle applies the same precedence, per sentence)
    pron_pre = pc.or_(pc.or_(pc.starts_with(text, "She "),
                             pc.starts_with(text, "He ")),
                      pc.or_(pc.starts_with(text, "Her "),
                             pc.starts_with(text, "His ")))
    pron_idx = pc.indices_nonzero(pc.fill_null(pron_pre, False))
    # empty-subset guard: regex/take kernels over empty chunked arrays are
    # unreliable in pyarrow 16 (observed flaky segfaults) — skip the loop
    # outright when no row is a candidate
    pron_text = (text.take(pron_idx).combine_chunks()
                 if len(pron_idx) else pa.array([], pa.string()))
    pron_matched_np = np.zeros(sents.num_rows, dtype=bool)
    for pred, rx, ok in ([] if not len(pron_idx)
                         else R.PRONOUN_TEMPLATES):
        ex = pc.extract_regex(pron_text, rx)
        mask = pc.is_valid(ex)
        if not pc.any(mask).as_py():
            continue
        local = pc.indices_nonzero(mask)
        idx = pron_idx.take(local)
        pron_matched_np[idx.to_numpy(zero_copy_only=False)] = True
        neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
        outs.append(_events_table(
            len(idx), conv.take(idx), tidx.take(idx),
            pa.array([None] * len(idx), pa.string()), pred,
            pc.struct_field(ex, "obj").take(local), "person", ok,
            sidx.take(idx), neg, inq, past, asp, since=snc, hedged=hed))

    # PLURAL-pronoun templates (v32): "They ..." — one event (subj NULL,
    # clause 'plural'); Stage B expands it over the anchor turn's
    # committed person SET.  Matched sentences join pron_matched so the
    # single/multi/list arms skip them (the pronoun-precedence rule).
    plu_idx = pc.indices_nonzero(pc.fill_null(
        pc.starts_with(text, R.PLURAL_PRONOUN + " "), False))
    plu_text = (text.take(plu_idx).combine_chunks()
                if len(plu_idx) else pa.array([], pa.string()))
    for pred, rx, ok in ([] if not len(plu_idx)
                         else R.PLURAL_PRONOUN_TEMPLATES):
        ex = pc.extract_regex(plu_text, rx)
        mask = pc.is_valid(ex)
        if not pc.any(mask).as_py():
            continue
        local = pc.indices_nonzero(mask)
        idx = plu_idx.take(local)
        pron_matched_np[idx.to_numpy(zero_copy_only=False)] = True
        neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
        outs.append(_events_table(
            len(idx), conv.take(idx), tidx.take(idx),
            pa.array([None] * len(idx), pa.string()), pred,
            pc.struct_field(ex, "obj").take(local), "person", ok,
            sidx.take(idx), neg, inq, past, asp, R.DEFAULT_SLOT_IDX,
            R.PLURAL_CLAUSE, since=snc, hedged=hed))

    # PLURAL-RECIPROCAL templates (v34): "They met." — BOTH slots null
    # (the subj∧obj-null event class); Stage B expands it over every
    # ordered pair of the anchor turn's committed person set.  Shares
    # the "They " prefilter with the v32 plural loop above.
    for pred, rx in ([] if not len(plu_idx)
                     else R.PLURAL_RECIP_TEMPLATES):
        mask = pc.fill_null(pc.match_substring_regex(plu_text, rx), False)
        if not pc.any(mask).as_py():
            continue
        local = pc.indices_nonzero(mask)
        idx = plu_idx.take(local)
        pron_matched_np[idx.to_numpy(zero_copy_only=False)] = True
        neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
        outs.append(_events_table(
            len(idx), conv.take(idx), tidx.take(idx),
            pa.array([None] * len(idx), pa.string()), pred,
            pa.array([None] * len(idx), pa.string()), "person", "person",
            sidx.take(idx), neg, inq, past, asp, R.DEFAULT_SLOT_IDX,
            R.PLURAL_RECIP_CLAUSE, since=snc, hedged=hed))

    # ORG-pronoun templates (v38): "It acquired X." — a descriptor-class
    # event (subj NULL, desc_key = the reserved ORG_REF_KEY) with
    # subj_kind='org'; Stage B resolves it on the generic descriptor
    # forward-fill path against the org referent state committed by
    # fully-explicit org-bearing rows (see _resolve_subset_plain).
    it_idx = pc.indices_nonzero(pc.fill_null(
        pc.starts_with(text, R.ORG_PRONOUN + " "), False))
    it_text = (text.take(it_idx).combine_chunks()
               if len(it_idx) else pa.array([], pa.string()))
    for pred, rx, ok in ([] if not len(it_idx)
                         else R.ORG_PRONOUN_TEMPLATES):
        ex = pc.extract_regex(it_text, rx)
        mask = pc.is_valid(ex)
        if not pc.any(mask).as_py():
            continue
        local = pc.indices_nonzero(mask)
        idx = it_idx.take(local)
        pron_matched_np[idx.to_numpy(zero_copy_only=False)] = True
        neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
        outs.append(_events_table(
            len(idx), conv.take(idx), tidx.take(idx),
            pa.array([None] * len(idx), pa.string()), pred,
            pc.struct_field(ex, "obj").take(local), "org", ok,
            sidx.take(idx), neg, inq, past, asp, R.DEFAULT_SLOT_IDX,
            R.ORG_PRON_CLAUSE, R.ORG_REF_KEY, since=snc, hedged=hed))

    cand_idx = pc.indices_nonzero(pc.fill_null(
        pc.match_substring_regex(text, _ANY_LITERAL_RE), False))
    n_cand = len(cand_idx)
    # empty-subset guard (see pron_text note above)
    cand_text = (text.take(cand_idx).combine_chunks()
                 if n_cand else pa.array([], pa.string()))

    # OBJECT-pronoun templates ("Alice met with her."): emit an event
    # with NULL obj (the object-pronoun store discriminator) carrying the
    # explicit subject — Stage B resolves the object and the subject
    # feeds referent state.  Candidates come from the same any-literal
    # gate (each template's verb literal is already in the set).
    for pred, rx, ok in (R.PRONOUN_OBJECT_TEMPLATES if n_cand else []):
        lit = _TEMPLATE_LITERALS.get(pred)
        if lit is not None:
            pre = pc.match_substring(cand_text, lit)
            idx0 = cand_idx.take(
                pc.indices_nonzero(pc.fill_null(pre, False)))
        else:
            idx0 = cand_idx
        if len(idx0) == 0:
            continue
        ex = pc.extract_regex(text.take(idx0), rx)
        mask = pc.is_valid(ex)
        subj = pc.struct_field(ex, "subj")
        mask = pc.and_(mask, pc.invert(pc.fill_null(
            pc.is_in(subj, value_set=_PRONOUN_SET), False)))
        if not pc.any(mask).as_py():
            continue
        local = pc.indices_nonzero(mask)
        idx = idx0.take(local)
        neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
        outs.append(_events_table(
            len(idx), conv.take(idx), tidx.take(idx),
            subj.take(local), pred,
            pa.array([None] * len(idx), pa.string()), "person", ok,
            sidx.take(idx), neg, inq, past, asp, since=snc, hedged=hed))

    # OBJECT pronouns inside quoted speech (v18): same event class as
    # the plain object-pronoun rows (subj + NULL obj, no desc_key) —
    # Stage B needs no changes; clause='quoted' marks the nesting and
    # the speaker is never an emitted slot.
    for pred, rx, ok in (R.QUOTED_PRONOUN_OBJECT_TEMPLATES
                         if n_cand else []):
        lit = _TEMPLATE_LITERALS.get(pred)
        pre = pc.match_substring(cand_text, lit)
        idx0 = cand_idx.take(pc.indices_nonzero(pc.fill_null(pre, False)))
        if len(idx0) == 0:
            continue
        ex = pc.extract_regex(text.take(idx0), rx)
        mask = pc.is_valid(ex)
        subj = pc.struct_field(ex, "subj")
        mask = pc.and_(mask, pc.invert(pc.fill_null(
            pc.is_in(subj, value_set=_PRONOUN_SET), False)))
        if not pc.any(mask).as_py():
            continue
        local = pc.indices_nonzero(mask)
        idx = idx0.take(local)
        neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
        outs.append(_events_table(
            len(idx), conv.take(idx), tidx.take(idx),
            subj.take(local), pred,
            pa.array([None] * len(idx), pa.string()), "person", ok,
            sidx.take(idx), neg, inq, past, asp, R.DEFAULT_SLOT_IDX,
            R.QUOTED_CLAUSE, since=snc, hedged=hed))

    for pred, rx, sk, ok in R.TEMPLATES + list(extra_templates or []):
        lit = _TEMPLATE_LITERALS.get(pred)
        if lit is not None:
            if not n_cand:
                continue
            pre = pc.match_substring(cand_text, lit)
            idx0 = cand_idx.take(
                pc.indices_nonzero(pc.fill_null(pre, False)))
        else:  # config templates carry no literal prefilter
            idx0 = pa.array(range(len(text)), pa.int64())
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
        neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
        outs.append(_events_table(
            len(idx), conv.take(idx), tidx.take(idx),
            subj.take(local), pred,
            pc.struct_field(ex, "obj").take(local), sk, ok,
            sidx.take(idx), neg, inq, past, asp, since=snc, hedged=hed))

    # multi-relation templates (coordination / appositive / relative /
    # quoted): ONE RE2 extract per template, N emissions per match — the
    # nested-AST multi-relation analog.  Each emission checks its own
    # subject against the pronoun set (a coordinated 'She' slot must not
    # leak an unresolved pronoun as a subject surface).
    for name, rx, emissions in (R.MULTI_TEMPLATES
                                + list(extra_multi_templates or [])):
        lit = R.MULTI_TEMPLATE_LITERALS.get(name)
        if lit is not None and not n_cand:
            continue
        if lit is None:
            idx0 = pa.array(range(len(text)), pa.int64())
        else:
            # a tuple literal is a CONJUNCTION of memchr prefilters
            # (all must hit) — e.g. recip_met needs " and " AND " met"
            lits = lit if isinstance(lit, tuple) else (lit,)
            pre = pc.fill_null(pc.match_substring(cand_text, lits[0]),
                               False)
            for extra in lits[1:]:
                pre = pc.and_(pre, pc.fill_null(
                    pc.match_substring(cand_text, extra), False))
            idx0 = cand_idx.take(pc.indices_nonzero(pre))
        if len(idx0) == 0:
            continue
        sub = text.take(idx0)
        ex = pc.extract_regex(sub, rx)
        base_mask = pc.is_valid(ex)
        not_pm = pc.invert(pa.array(
            pron_matched_np[idx0.to_numpy(zero_copy_only=False)]))
        base_mask = pc.and_(base_mask, not_pm)
        if not pc.any(base_mask).as_py():
            continue
        for pred, subj_g, sk, obj_g, ok, slot, clause in emissions:
            subj = pc.struct_field(ex, subj_g)
            obj = pc.struct_field(ex, obj_g)
            is_pron = pc.fill_null(
                pc.is_in(subj, value_set=_PRONOUN_SET), False)
            # v21 object-pronoun rule (rules.py): a pronoun in a person
            # OBJECT slot (reciprocal coordination, v25 appositive) rides
            # the Stage-B object-pronoun class; both-pronoun emissions drop
            obj_pron = (pc.fill_null(
                pc.is_in(obj, value_set=_OBJ_PRONOUN_SET), False)
                if ok == "person" else None)
            mask = pc.and_(base_mask, pc.invert(is_pron))
            if obj_pron is not None:
                mask = pc.and_(mask, pc.invert(obj_pron))
            if pc.any(mask).as_py():
                local = pc.indices_nonzero(mask)
                idx = idx0.take(local)
                neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
                outs.append(_events_table(
                    len(idx), conv.take(idx), tidx.take(idx),
                    subj.take(local), pred,
                    obj.take(local), sk, ok,
                    sidx.take(idx), neg, inq, past, asp, slot, clause,
                    since=snc, hedged=hed))
            # a pronoun in a person subject slot ("She and Bob work at X")
            # becomes a PRONOUN event (subj NULL) carrying the emission's
            # slot/clause — resolved in Stage B like any pronoun turn
            if sk == "person":
                pmask = pc.and_(base_mask, is_pron)
                if obj_pron is not None:
                    pmask = pc.and_(pmask, pc.invert(obj_pron))
                if pc.any(pmask).as_py():
                    local = pc.indices_nonzero(pmask)
                    idx = idx0.take(local)
                    neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
                    outs.append(_events_table(
                        len(idx), conv.take(idx), tidx.take(idx),
                        pa.array([None] * len(idx), pa.string()), pred,
                        obj.take(local), sk, ok,
                        sidx.take(idx), neg, inq, past, asp, slot, clause,
                    since=snc, hedged=hed))
            # a pronoun in a person OBJECT slot ("She and Bob met." —
            # emission met(Bob, She)) becomes an OBJECT-PRONOUN event
            # (explicit subj, NULL obj): Stage B fills the object and the
            # subject feeds referent state (the object-pronoun discipline)
            if ok == "person":
                omask = pc.and_(pc.and_(base_mask, obj_pron),
                                pc.invert(is_pron))
                if pc.any(omask).as_py():
                    local = pc.indices_nonzero(omask)
                    idx = idx0.take(local)
                    neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
                    outs.append(_events_table(
                        len(idx), conv.take(idx), tidx.take(idx),
                        subj.take(local), pred,
                        pa.array([None] * len(idx), pa.string()), sk, ok,
                        sidx.take(idx), neg, inq, past, asp, slot, clause,
                    since=snc, hedged=hed))

    # LIST templates (open-ended coordination, v12): RE2 captures the list
    # head as ONE group; the split into member slots is a vectorized
    # split_pattern + list_flatten (the _explode_sentences discipline) —
    # one event per member, slot_idx = list position, the trailing
    # conjunct at slot len(head).
    for name, rx, pred, mk, ok, clause in R.LIST_TEMPLATES:
        lit = R.LIST_TEMPLATE_LITERALS.get(name)
        if lit is not None and not n_cand:
            continue
        if lit is None:
            idx0 = pa.array(range(len(text)), pa.int64())
        else:
            # tuple literal = conjunction of memchr prefilters, the
            # MULTI_TEMPLATE_LITERALS discipline (v30)
            lits = lit if isinstance(lit, tuple) else (lit,)
            pre = pc.fill_null(pc.match_substring(cand_text, lits[0]),
                               False)
            for extra in lits[1:]:
                pre = pc.and_(pre, pc.fill_null(
                    pc.match_substring(cand_text, extra), False))
            idx0 = cand_idx.take(pc.indices_nonzero(pre))
        if len(idx0) == 0:
            continue
        ex = pc.extract_regex(text.take(idx0), rx)
        base_mask = pc.is_valid(ex)
        not_pm = pc.invert(pa.array(
            pron_matched_np[idx0.to_numpy(zero_copy_only=False)]))
        base_mask = pc.and_(base_mask, not_pm)
        if not pc.any(base_mask).as_py():
            continue
        local = pc.indices_nonzero(base_mask)
        idx = idx0.take(local)

        def _arr(x):
            return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

        head = _arr(pc.struct_field(ex, "list").take(local))
        last = _arr(pc.struct_field(ex, "last").take(local))
        obj = pc.struct_field(ex, "obj").take(local)
        parts = _arr(pc.split_pattern(head, R.LIST_SEP))
        parent = _arr(pc.list_parent_indices(parts))
        flat = _arr(pc.list_flatten(parts))
        offs = parts.offsets.to_numpy()
        lens = np.diff(offs)
        slot_head = (np.arange(len(flat), dtype=np.int64)
                     - np.repeat(offs[:-1], lens))
        # members = head members ++ trailing conjunct (slot = head length)
        members = pa.concat_arrays([flat, _arr(pc.cast(last, pa.string()))])
        m_sent = pa.concat_arrays([  # per-member index into the match rows
            _arr(parent.cast(pa.int64())),
            pa.array(np.arange(len(idx), dtype=np.int64), pa.int64())])
        m_slot = pa.array(np.concatenate(
            [slot_head, lens.astype(np.int64)]).astype("int32"), pa.int32())
        m_idx = idx.take(m_sent)   # sentence-row index per member
        m_obj = obj.take(m_sent)
        m_neg, m_inq, m_past, m_asp, m_snc, m_hed = (
            neg_all.take(m_idx), inq_all.take(m_idx),
            past_all.take(m_idx), asp_all.take(m_idx),
            snc_all.take(m_idx), hed_all.take(m_idx))
        is_pron = pc.fill_null(
            pc.is_in(members, value_set=_PRONOUN_SET), False)
        npron = pc.indices_nonzero(pc.invert(is_pron))
        if len(npron):
            outs.append(_events_table(
                len(npron), conv.take(m_idx.take(npron)),
                tidx.take(m_idx.take(npron)),
                members.take(npron), pred, m_obj.take(npron), mk, ok,
                sidx.take(m_idx.take(npron)), m_neg.take(npron),
                m_inq.take(npron), m_past.take(npron),
                m_asp.take(npron), m_slot.take(npron), clause,
                since=m_snc.take(npron), hedged=m_hed.take(npron)))
        if mk == "person":
            ppron = pc.indices_nonzero(is_pron)
            if len(ppron):
                outs.append(_events_table(
                    len(ppron), conv.take(m_idx.take(ppron)),
                    tidx.take(m_idx.take(ppron)),
                    pa.array([None] * len(ppron), pa.string()), pred,
                    m_obj.take(ppron), mk, ok,
                    sidx.take(m_idx.take(ppron)), m_neg.take(ppron),
                    m_inq.take(ppron), m_past.take(ppron),
                    m_asp.take(ppron), m_slot.take(ppron), clause,
                    since=m_snc.take(ppron), hedged=m_hed.take(ppron)))

    # definite-description templates (cross-sentence anaphora, v12): emit a
    # DESCRIPTOR event — subj NULL + desc_key (the module) — resolved in
    # Stage B against module-keyed maintainer state; the explicit person
    # object rides along and feeds pronoun-referent state as usual.
    if n_cand:
        pre = pc.match_substring_regex(cand_text, R.DESC_ANY_RE)
        idx0 = cand_idx.take(pc.indices_nonzero(pc.fill_null(pre, False)))
        for pred, rx, ok, clause in (R.DESC_TEMPLATES if len(idx0) else []):
            ex = pc.extract_regex(text.take(idx0), rx)
            mask = pc.is_valid(ex)
            not_pm = pc.invert(pa.array(
                pron_matched_np[idx0.to_numpy(zero_copy_only=False)]))
            mask = pc.and_(mask, not_pm)
            if not pc.any(mask).as_py():
                continue
            local = pc.indices_nonzero(mask)
            idx = idx0.take(local)
            neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
            outs.append(_events_table(
                len(idx), conv.take(idx), tidx.take(idx),
                pa.array([None] * len(idx), pa.string()), pred,
                pc.struct_field(ex, "obj").take(local), "person", ok,
                sidx.take(idx), neg, inq, past, asp, R.DEFAULT_SLOT_IDX,
                clause,
                pc.struct_field(ex, "key").take(local), since=snc, hedged=hed))

    # ORG-keyed descriptor family (v28): same event class as the
    # maintainer/manager descriptors (subj NULL + desc_key); the key is
    # the LOWERCASED org base, which matches the normalized key the
    # works_at state rows commit under (rules.py v28 contract) — Stage B
    # resolution rides the generic descriptor machinery unchanged.
    if n_cand:
        pre = pc.match_substring(cand_text, R.DESC_ORG_LITERAL)
        idx0 = cand_idx.take(pc.indices_nonzero(pc.fill_null(pre, False)))
        for pred, rx, ok, clause in (R.DESC_ORG_TEMPLATES
                                     if len(idx0) else []):
            ex = pc.extract_regex(text.take(idx0), rx)
            mask = pc.is_valid(ex)
            not_pm = pc.invert(pa.array(
                pron_matched_np[idx0.to_numpy(zero_copy_only=False)]))
            mask = pc.and_(mask, not_pm)
            if not pc.any(mask).as_py():
                continue
            local = pc.indices_nonzero(mask)
            idx = idx0.take(local)
            neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
            outs.append(_events_table(
                len(idx), conv.take(idx), tidx.take(idx),
                pa.array([None] * len(idx), pa.string()), pred,
                pc.struct_field(ex, "obj").take(local), "person", ok,
                sidx.take(idx), neg, inq, past, asp, R.DEFAULT_SLOT_IDX,
                clause,
                pc.utf8_lower(pc.struct_field(ex, "key").take(local)),
                since=snc, hedged=hed))

    # OBJECT-side definite descriptions (v15): emit an event with the
    # explicit subject, NULL obj and desc_key (the module) — the
    # subj∧¬obj∧desc_key store class.  Stage B fills the object from the
    # module-keyed maintainer state; the explicit subject feeds
    # pronoun-referent state (the object-pronoun discipline).  Pronoun
    # subjects are skipped outright (rules.py v15 contract).
    if n_cand:
        pre = pc.match_substring_regex(cand_text, R.DESC_OBJ_ANY_RE)
        idx0 = cand_idx.take(pc.indices_nonzero(pc.fill_null(pre, False)))
        for pred, rx, clause in (R.DESC_OBJ_TEMPLATES if len(idx0) else []):
            ex = pc.extract_regex(text.take(idx0), rx)
            mask = pc.is_valid(ex)
            subj = pc.struct_field(ex, "subj")
            mask = pc.and_(mask, pc.invert(pc.fill_null(
                pc.is_in(subj, value_set=_PRONOUN_SET), False)))
            mask = pc.and_(mask, pc.invert(pa.array(
                pron_matched_np[idx0.to_numpy(zero_copy_only=False)])))
            if not pc.any(mask).as_py():
                continue
            local = pc.indices_nonzero(mask)
            idx = idx0.take(local)
            neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
            outs.append(_events_table(
                len(idx), conv.take(idx), tidx.take(idx),
                subj.take(local), pred,
                pa.array([None] * len(idx), pa.string()), "person",
                "person", sidx.take(idx), neg, inq, past, asp,
                R.DEFAULT_SLOT_IDX, clause,
                pc.struct_field(ex, "key").take(local), since=snc, hedged=hed))

    # untyped-mention events (kind-recovery overlay input, rules.MENTIONED_RE,
    # obj_kind='unknown') ride the SAME extraction map and events store —
    # no second text scan for the overlay.  They are NOT surface triples
    # (excluded by _passthrough_triples), contribute NO referent state
    # (excluded in _resolve_subset/_resolve_group) and NO kind evidence
    # (excluded in kindrec.evidence_batch): the store is a superset, the
    # grammar semantics are unchanged.
    if n_cand:
        pre = pc.match_substring(cand_text, R.MENTIONED_LITERAL)
        idx0 = cand_idx.take(pc.indices_nonzero(pc.fill_null(pre, False)))
        if len(idx0):
            ex = pc.extract_regex(text.take(idx0), R.MENTIONED_RE)
            mask = pc.is_valid(ex)
            subj = pc.struct_field(ex, "subj")
            mask = pc.and_(mask, pc.invert(pc.fill_null(
                pc.is_in(subj, value_set=_PRONOUN_SET), False)))
            if pc.any(mask).as_py():
                local = pc.indices_nonzero(mask)
                idx = idx0.take(local)
                neg, inq, past, asp, snc, hed = (
            neg_all.take(idx), inq_all.take(idx),
            past_all.take(idx), asp_all.take(idx), snc_all.take(idx),
            hed_all.take(idx))
                outs.append(_events_table(
                    len(idx), conv.take(idx), tidx.take(idx),
                    subj.take(local), R.MENTIONED_PRED,
                    pc.struct_field(ex, "obj").take(local),
                    "person", R.UNKNOWN_KIND,
                    sidx.take(idx), neg, inq, past, asp, since=snc, hedged=hed))

    if not outs:
        return S.EVENTS.empty_table()
    return pa.concat_tables(outs)


def _resolve_group(group: pa.Table) -> pa.Table:
    """Stage B group fn: one conversation's events, any order in, surface
    triples out.  Resolution contract (rules.py): the referent for turn t is
    the lexicographically greatest person slot of the LATEST turn with
    turn_idx < t — turn-level state commit, so duplicate-turn_idx rows and
    multi-match turns resolve deterministically regardless of block arrival
    order."""
    group = group.sort_by([("turn_idx", "ascending")])
    # untyped-mention overlay rows (obj_kind='unknown') are not grammar
    # events: neither output triples nor referent state — drop up front
    # (mirrors _passthrough_triples + _resolve_subset)
    group = group.filter(pc.not_equal(
        group.column("obj_kind").cast(pa.string()), R.UNKNOWN_KIND))
    # events needing Stage B: NULL subj (subject pronoun / descriptor) or
    # NULL obj (object pronoun) — the EVENTS store invariants
    has_pronoun = (pc.any(pc.is_null(group.column("subj"))).as_py()
                   or pc.any(pc.is_null(group.column("obj"))).as_py())
    if not has_pronoun:
        return (group.drop_columns(["desc_key"])
                .cast(S.TRIPLES_SURFACE))   # decode dict categoricals
    rows = group.to_pylist()
    keep: list[dict] = []
    # committed person contributions of the latest person-bearing turn —
    # the singular referent is max(last_persons); the v32 plural pronoun
    # expands over the whole set (one state stream, two read rules)
    last_persons: set[str] = set()
    last_person: str | None = None   # == max(last_persons) or None
    cur_turn: int | None = None
    cur_persons: set[str] = set()    # person contributions this turn
    last_maint: dict[str, str] = {}  # committed module -> maintainer
    cur_maint: dict[str, str] = {}   # current turn's max maintainer / module

    def _commit(p):
        nonlocal cur_persons
        if p is not None:
            cur_persons.add(p)

    for r in rows:
        if r["turn_idx"] != cur_turn:
            if cur_persons:
                last_persons = cur_persons
                last_person = max(last_persons)
            if cur_maint:
                last_maint.update(cur_maint)
            cur_turn = r["turn_idx"]
            cur_persons = set()
            cur_maint = {}
        if r["subj"] is None:
            if r.get("clause") == R.PLURAL_RECIP_CLAUSE:
                # v34 plural reciprocal: expand over every ORDERED PAIR
                # of distinct members (quadratic fan-out); slot_idx =
                # the subject's lexicographic rank; resolved rows feed
                # no state; a single-member set emits nothing
                mems = sorted(last_persons)
                for i, a in enumerate(mems):
                    for b in mems:
                        if b != a:
                            keep.append(dict(r, subj=a, obj=b,
                                             slot_idx=i))
                continue
            if r.get("clause") == R.PLURAL_CLAUSE:
                # v32 plural pronoun: expand over the anchor turn's
                # committed person set, slot_idx = lexicographic rank;
                # resolved rows feed no state
                for slot, mem in enumerate(sorted(last_persons)):
                    keep.append(dict(r, subj=mem, slot_idx=slot))
                continue
            if r.get("desc_key") is not None:
                # definite-description event: resolve against the committed
                # module-keyed maintainer state; the explicit person object
                # feeds pronoun-referent state (the object-pronoun
                # discipline); the resolved row feeds no state
                ref = last_maint.get(r["desc_key"])
                if ref is not None:
                    keep.append(dict(r, subj=ref))
                p = r["obj"] if r["obj_kind"] == "person" else None
                _commit(p)
                continue
            if last_person is not None:
                keep.append(dict(r, subj=last_person))
            continue
        if r["obj"] is None:
            if r.get("desc_key") is not None:
                # OBJECT-side definite description (v15): the object
                # resolves against the committed maintainer state; the
                # explicit subject feeds referent state (object-pronoun
                # discipline); the resolved row feeds no state
                ref = last_maint.get(r["desc_key"])
                if ref is not None:
                    keep.append(dict(r, obj=ref))
                p = r["subj"] if r["subj_kind"] == "person" else None
                _commit(p)
                continue
            # object-pronoun event
            if last_person is not None:
                keep.append(dict(r, obj=last_person))
            p = r["subj"] if r["subj_kind"] == "person" else None
            _commit(p)
            continue
        keep.append(r)
        p = (r["obj"] if r["obj_kind"] == "person"
             else r["subj"] if r["subj_kind"] == "person" else None)
        _commit(p)
        if r["pred"] in R.DESC_STATE_PREDS:  # explicit state-family event
            m = cur_maint.get(r["obj"])
            if m is None or r["subj"] > m:
                cur_maint[r["obj"]] = r["subj"]
        elif r["pred"] == R.ORG_STATE_PRED and r["obj_kind"] == "org":
            # v28 org-keyed family: key = normalized org surface (the
            # typo'd-surface contract in rules.py)
            key = R.normalize_surface("org", r["obj"])
            m = cur_maint.get(key)
            if m is None or r["subj"] > m:
                cur_maint[key] = r["subj"]
        # v38 org REFERENT state: every fully-explicit row with an
        # org-kind slot commits its org SURFACE (object shadows subject)
        org = (r["obj"] if r["obj_kind"] == "org"
               else r["subj"] if r["subj_kind"] == "org" else None)
        if org is not None:
            m = cur_maint.get(R.ORG_REF_KEY)
            if m is None or org > m:
                cur_maint[R.ORG_REF_KEY] = org
    if not keep:
        return S.TRIPLES_SURFACE.empty_table()
    return pa.Table.from_pylist(keep, schema=S.TRIPLES_SURFACE)


def _resolve_bucket(group: pa.Table,
                    cap: int | None = None) -> pa.Table:
    """Vectorized resolver for a BUCKET of whole conversations: per-turn
    max person state keyed by (conv_code << 32 | turn) ints, referent via
    one searchsorted (strictly-earlier turn), substituted into pronoun
    rows.  Emits ONLY the resolved pronoun triples — non-pronoun triples
    take the shuffle-free passthrough in ``extract_triples``.  Input is the
    narrow ``_resolve_subset`` schema (state rows carry just the person
    value; pronoun rows carry the triple payload).  Semantics match
    ``_resolve_group`` (the per-conversation reference implementation, kept
    for tests); pathological conversations (> cap rows) divert to the
    deterministic pandas path."""
    import numpy as np
    import pandas as pd

    if group.num_rows == 0:
        return S.TRIPLES_SURFACE.empty_table()
    if cap is None:
        cap = MAX_RESOLVE_EVENTS_PER_CONV
    g = _decode_narrow(group.drop_columns(["bucket"])).combine_chunks()
    codes, _uniq = pd.factorize(
        g.column("conv_id").to_numpy(zero_copy_only=False), sort=False)
    turn = g.column("turn_idx").to_numpy().astype(np.int64)
    if (np.bincount(codes) > cap).any() or (len(turn) and turn.min() < 0):
        return _resolve_bucket_slow(g, cap)
    # fast path (no pathological conversations): resolution is a pure
    # function of the row SET — referent(t) = max person of the latest
    # person-bearing turn < t — so no content sort is needed at all.
    # Composite int key (conv code << 32 | turn) makes the turn-level
    # lookup one int argsort + searchsorted: no string sorts, no
    # merge_asof, ~30x less CPU than the pandas formulation at 64M turns.
    key = (codes.astype(np.int64) << 32) | turn
    person = g.column("person").to_numpy(zero_copy_only=False)
    is_state = pc.is_valid(g.column("person")).to_numpy(
        zero_copy_only=False)
    has_pred = pc.is_valid(g.column("pred")).to_numpy(zero_copy_only=False)
    has_dk = pc.is_valid(g.column("desc_key")).to_numpy(
        zero_copy_only=False)
    # narrow-schema row classes (see _resolve_subset): pronoun rows carry
    # pred without desc_key; descriptor rows carry both; maintainer-state
    # rows carry desc_key without pred.  The v32 plural-pronoun rows are
    # the clause='plural' subclass of the pronoun class — they expand
    # over the anchor turn's person SET instead of taking its max.
    is_pron = has_pred & ~has_dk
    clause_np = g.column("clause").cast(pa.string()).to_numpy(
        zero_copy_only=False)
    is_plural = is_pron & (clause_np == R.PLURAL_CLAUSE)
    # v34 plural-reciprocal rows: the clause='plural_recip' subclass —
    # BOTH slots come from the anchor set (ordered-pair expansion)
    is_plu_pair = is_pron & (clause_np == R.PLURAL_RECIP_CLAUSE)
    is_pron = is_pron & ~is_plural & ~is_plu_pair
    is_desc = has_pred & has_dk
    is_mst = ~has_pred & has_dk
    # descriptor-state rows are NOT person-referent state (v16: a manages
    # event's person contribution is its OBJECT, shipped on its own row;
    # the state row's `person` is the SUBJECT/state value)
    is_state = is_state & ~is_mst

    def _emit(rows: np.ndarray, referent: np.ndarray,
              ref_is_subj_only: bool) -> pa.Table:
        """Resolved rows → TRIPLES_SURFACE.  For pronoun rows the referent
        fills whichever slot the row class dictates (own person ⇒ object-
        pronoun ⇒ referent is the OBJECT); descriptor rows always take the
        referent as SUBJECT and keep their explicit object."""
        sub = g.take(pa.array(rows, pa.int64()))
        n = sub.num_rows
        ref_arr = pa.array(referent, pa.string())
        own = sub.column("person").cast(pa.string())
        if isinstance(own, pa.ChunkedArray):
            own = own.combine_chunks()
        if ref_is_subj_only:
            subj_out, obj_out = ref_arr, sub.column("obj").cast(pa.string())
        else:
            opron = pc.is_valid(own)
            subj_out = pc.if_else(opron, own, ref_arr)
            obj_out = pc.if_else(opron, ref_arr,
                                 sub.column("obj").cast(pa.string()))
        clause_out = sub.column("clause").cast(pa.string())
        if isinstance(clause_out, pa.ChunkedArray):
            clause_out = clause_out.combine_chunks()
        # v38: org-pronoun rows resolve to an ORG subject; the narrow
        # schema drops subj_kind, so rebuild it clause-conditionally
        sk_out = pc.if_else(
            pc.equal(clause_out, R.ORG_PRON_CLAUSE),
            pa.scalar("org", pa.string()), pa.scalar("person", pa.string()))
        return pa.Table.from_arrays(
            [sub.column("conv_id").cast(pa.string()),
             sub.column("turn_idx").cast(pa.int32()),
             subj_out,
             sub.column("pred").cast(pa.string()),
             obj_out,
             sk_out,
             sub.column("obj_kind").cast(pa.string()),
             sub.column("sent_idx").cast(pa.int32()),
             sub.column("negated").cast(pa.bool_()),
             sub.column("in_question").cast(pa.bool_()),
             sub.column("is_past").cast(pa.bool_()),
             sub.column("aspect").cast(pa.string()),
             sub.column("since_year").cast(pa.int32()),
             sub.column("hedged").cast(pa.bool_()),
             sub.column("slot_idx").cast(pa.int32()),
             clause_out],
            schema=S.TRIPLES_SURFACE)

    def _latest_earlier(skeys, svals_codes, uniq, qkeys):
        """Turn-level committed-state lookup: per-key max value via one int
        lexsort, then latest strictly-earlier turn of the same entity via
        searchsorted.  Returns (ok_mask, referent values for ok rows)."""
        order = np.lexsort((svals_codes, skeys))
        sk = skeys[order]
        pcs = svals_codes[order]
        last = np.nonzero(np.concatenate((sk[1:] != sk[:-1], [True])))[0]
        tp_keys = sk[last]                            # sorted ascending
        tp_vals = np.asarray(uniq, dtype=object)[pcs[last]]
        pos = np.searchsorted(tp_keys, qkeys, side="left") - 1
        ok = pos >= 0
        safe = np.where(ok, pos, 0)
        ok &= (tp_keys[safe] >> 32) == (qkeys >> 32)  # same entity
        return ok, tp_vals[safe[ok]]

    parts: list[pa.Table] = []
    if is_state.any() and (is_pron.any() or is_plural.any()
                           or is_plu_pair.any()):
        # per-turn max person, fully vectorized: sorted factorize gives
        # person codes order-isomorphic to the lexicographic strings
        # (pandas object groupby.max would fall back to per-group Python)
        pcodes, puniq = pd.factorize(person[is_state], sort=True)
        if is_pron.any():
            ok, referent = _latest_earlier(
                key[is_state], pcodes, puniq, key[is_pron])
            pron_rows = np.nonzero(is_pron)[0][ok]
            if len(pron_rows):  # empty-take guard (pyarrow 16 flakes)
                parts.append(_emit(pron_rows, referent, False))
        if is_plural.any() or is_plu_pair.any():
            # v32 plural expansion machinery, shared by the v34 pair
            # rule: dedupe state to DISTINCT (turn-key, person) pairs
            # sorted by person code, then one searchsorted to the latest
            # strictly-earlier person-bearing turn and an
            # offset-arithmetic fan-out — slot_idx = lexicographic rank
            # (pcodes are sort=True, so code order IS lexicographic
            # order)
            skeys = key[is_state]
            order = np.lexsort((pcodes, skeys))
            sk = skeys[order]
            pcs = pcodes[order]
            keep = np.ones(len(sk), dtype=bool)
            keep[1:] = (sk[1:] != sk[:-1]) | (pcs[1:] != pcs[:-1])
            sk2, pcs2 = sk[keep], pcs[keep]
            tstart = np.nonzero(np.concatenate(
                ([True], sk2[1:] != sk2[:-1])))[0].astype(np.int64)
            tkeys = sk2[tstart]
            tend = np.concatenate((tstart[1:], [len(sk2)])).astype(
                np.int64)

            def _anchor(mask: np.ndarray):
                """(resolved event rows, member-range starts, sizes) of
                the anchor turn for each mask row with one."""
                qk = key[mask]
                pos = np.searchsorted(tkeys, qk, side="left") - 1
                ok = pos >= 0
                safe = np.where(ok, pos, 0)
                ok &= (tkeys[safe] >> 32) == (qk >> 32)  # same conv
                rows = np.nonzero(mask)[0][ok]
                return rows, tstart[pos[ok]], tend[pos[ok]]

            def _surface(out_rows, subj_members, intra, obj_members=None):
                sub = g.take(pa.array(out_rows, pa.int64()))
                obj_col = (sub.column("obj").cast(pa.string())
                           if obj_members is None
                           else pa.array(obj_members, pa.string()))
                return pa.Table.from_arrays(
                    [sub.column("conv_id").cast(pa.string()),
                     sub.column("turn_idx").cast(pa.int32()),
                     pa.array(subj_members, pa.string()),
                     sub.column("pred").cast(pa.string()),
                     obj_col,
                     pa.array(["person"] * len(out_rows), pa.string()),
                     (sub.column("obj_kind").cast(pa.string())
                      if obj_members is None
                      else pa.array(["person"] * len(out_rows),
                                    pa.string())),
                     sub.column("sent_idx").cast(pa.int32()),
                     sub.column("negated").cast(pa.bool_()),
                     sub.column("in_question").cast(pa.bool_()),
                     sub.column("is_past").cast(pa.bool_()),
                     sub.column("aspect").cast(pa.string()),
                     sub.column("since_year").cast(pa.int32()),
                     sub.column("hedged").cast(pa.bool_()),
                     pa.array(intra.astype("int32"), pa.int32()),
                     sub.column("clause").cast(pa.string())],
                    schema=S.TRIPLES_SURFACE)

            if is_plural.any():
                plu_rows, s, e = _anchor(is_plural)
                if len(plu_rows):
                    counts = e - s
                    total = int(counts.sum())
                    out_rows = np.repeat(plu_rows, counts)
                    cum = np.concatenate(([0], np.cumsum(counts[:-1])))
                    intra = (np.arange(total, dtype=np.int64)
                             - np.repeat(cum, counts))
                    member_idx = np.repeat(s, counts) + intra
                    members = np.asarray(puniq, dtype=object)[
                        pcs2[member_idx]]
                    parts.append(_surface(out_rows, members, intra))
            if is_plu_pair.any():
                # v34 ordered-pair fan-out: k members ⇒ k² grid rows,
                # diagonal masked off — subj rank i IS the slot_idx
                pr_rows, s, e = _anchor(is_plu_pair)
                if len(pr_rows):
                    kk = e - s
                    tot2 = kk * kk
                    total = int(tot2.sum())
                    if total:
                        row_rep = np.repeat(
                            np.arange(len(pr_rows), dtype=np.int64),
                            tot2)
                        cum2 = np.concatenate(
                            ([0], np.cumsum(tot2[:-1])))
                        gidx = (np.arange(total, dtype=np.int64)
                                - np.repeat(cum2, tot2))
                        kkr = kk[row_rep]
                        i = gidx // kkr
                        j = gidx % kkr
                        off = np.nonzero(i != j)[0]
                        if len(off):
                            row_rep = row_rep[off]
                            i, j = i[off], j[off]
                            uniq_o = np.asarray(puniq, dtype=object)
                            subj_m = uniq_o[pcs2[s[row_rep] + i]]
                            obj_m = uniq_o[pcs2[s[row_rep] + j]]
                            parts.append(_surface(
                                pr_rows[row_rep], subj_m, i,
                                obj_members=obj_m))
    if is_desc.any() and is_mst.any():
        # module-keyed maintainer state: composite (conv, module) entity
        # codes from one factorize over the SMALL desc-relevant subset
        # (descriptor + maintains rows only), then the same turn-level
        # machinery as the pronoun path
        rel = is_desc | is_mst
        rel_idx = np.nonzero(rel)[0]
        sub = g.take(pa.array(rel_idx, pa.int64()))
        pair = pc.binary_join_element_wise(
            sub.column("conv_id").cast(pa.string()),
            sub.column("desc_key").cast(pa.string()), "\x1f")
        pcodes2, _ = pd.factorize(pair.to_numpy(zero_copy_only=False),
                                  sort=False)
        dkey = (pcodes2.astype(np.int64) << 32) | turn[rel_idx]
        sub_mst = is_mst[rel_idx]
        sub_desc = is_desc[rel_idx]
        mcodes, muniq = pd.factorize(person[rel_idx][sub_mst], sort=True)
        # side discriminator (narrow-schema contract): obj valid ⇒
        # subject-side descriptor (referent fills SUBJ); obj null ⇒
        # object-side v15 (referent fills OBJ, `person` is the explicit
        # subject — the _emit pronoun-style branch handles it)
        obj_valid = pc.is_valid(g.column("obj")).to_numpy(
            zero_copy_only=False)
        for side, ref_subj_only in ((sub_desc & obj_valid[rel_idx], True),
                                    (sub_desc & ~obj_valid[rel_idx],
                                     False)):
            if not side.any():
                continue
            ok, referent = _latest_earlier(
                dkey[sub_mst], mcodes, muniq, dkey[side])
            desc_rows = rel_idx[side][ok]
            if len(desc_rows):
                parts.append(_emit(desc_rows, referent, ref_subj_only))
    if not parts:
        return S.TRIPLES_SURFACE.empty_table()
    return pa.concat_tables(parts)


def _resolve_bucket_slow(g: pa.Table, cap: int) -> pa.Table:
    """Deterministic pandas path for buckets containing a pathological
    conversation (> cap resolver rows): full content sort so the cap
    truncates the same rows on every run, then the same turn-level
    resolution as the fast path."""
    import pandas as pd

    df = g.to_pandas()
    # FULL content sort (every payload column) so the cap truncates the
    # same rows on every run — v8 can emit two pronoun events in one
    # sentence differing only in slot_idx
    df = df.sort_values(
        ["conv_id", "turn_idx", "person", "pred", "obj", "sent_idx",
         "is_past", "aspect", "since_year", "hedged", "slot_idx",
         "clause", "desc_key"],
        kind="mergesort", ignore_index=True)
    within = df.groupby(df["conv_id"].to_numpy(), sort=False).cumcount()
    if (within >= cap).any():
        df = df[within < cap].reset_index(drop=True)
    import numpy as np

    def _payload(sel: pd.DataFrame) -> pd.DataFrame:
        return sel[["conv_id", "turn_idx", "pred", "obj", "obj_kind",
                    "sent_idx", "negated", "in_question", "is_past",
                    "aspect", "since_year", "hedged", "slot_idx",
                    "clause", "person"]] \
            .rename(columns={"person": "own_person"})

    def _table(out: pd.DataFrame, subj_np, obj_np) -> pa.Table:
        n = len(out)
        # v38: org-pronoun rows resolve to an ORG subject
        sk_np = np.where(
            out["clause"].to_numpy(object) == R.ORG_PRON_CLAUSE,
            "org", "person")
        return pa.Table.from_arrays(
            [pa.array(out["conv_id"].to_numpy(object), pa.string()),
             pa.array(out["turn_idx"].to_numpy(), pa.int32()),
             pa.array(subj_np, pa.string()),
             pa.array(out["pred"].to_numpy(object), pa.string()),
             pa.array(obj_np, pa.string()),
             pa.array(sk_np, pa.string()),
             pa.array(out["obj_kind"].to_numpy(object), pa.string()),
             pa.array(out["sent_idx"].to_numpy(), pa.int32()),
             pa.array(out["negated"].to_numpy(bool), pa.bool_()),
             pa.array(out["in_question"].to_numpy(bool), pa.bool_()),
             pa.array(out["is_past"].to_numpy(bool), pa.bool_()),
             pa.array(out["aspect"].to_numpy(object), pa.string()),
             pa.array(out["since_year"].astype("Int32").to_numpy(
                 na_value=None, dtype=object), pa.int32()),
             pa.array(out["hedged"].to_numpy(bool), pa.bool_()),
             pa.array(out["slot_idx"].to_numpy(), pa.int32()),
             pa.array(out["clause"].to_numpy(object), pa.string())],
            schema=S.TRIPLES_SURFACE)

    has_dk = df["desc_key"].notna().to_numpy()
    is_pron = df["pred"].notna().to_numpy() & ~has_dk
    # v32 plural-pronoun rows: the clause='plural' subclass (expand over
    # the anchor turn's person set instead of taking its max)
    is_plural = is_pron & (df["clause"] == R.PLURAL_CLAUSE).to_numpy()
    # v34 plural-reciprocal rows: ordered-pair expansion over the set
    is_plu_pair = (is_pron
                   & (df["clause"] == R.PLURAL_RECIP_CLAUSE).to_numpy())
    is_pron = is_pron & ~is_plural & ~is_plu_pair
    is_desc = df["pred"].notna().to_numpy() & has_dk
    is_mst = ~df["pred"].notna().to_numpy() & has_dk
    parts: list[pa.Table] = []
    # descriptor-state rows carry the state VALUE in `person` but are not
    # person-referent state (v16) — exclude them here
    state = df.loc[df["person"].notna() & ~is_mst,
                   ["conv_id", "turn_idx", "person"]]
    if len(state) and is_plural.any():
        # anchor = latest strictly-earlier person-bearing turn; expand
        # over its DISTINCT persons, slot_idx = lexicographic rank
        turn_set = state.drop_duplicates()
        pturns = (turn_set[["conv_id", "turn_idx"]].drop_duplicates()
                  .assign(anchor_turn=lambda d: d["turn_idx"])
                  .sort_values("turn_idx", kind="mergesort",
                               ignore_index=True))
        plu = _payload(df.loc[is_plural]).reset_index(drop=True)
        plu["_rid"] = np.arange(len(plu))
        plu = plu.sort_values("turn_idx", kind="mergesort",
                              ignore_index=True)
        out = pd.merge_asof(plu, pturns, on="turn_idx", by="conv_id",
                            direction="backward",
                            allow_exact_matches=False)
        out = out[out["anchor_turn"].notna()]
        if len(out):
            out = out.assign(anchor_turn=out["anchor_turn"].astype(
                turn_set["turn_idx"].dtype))
            exp = out.merge(
                turn_set.rename(columns={"turn_idx": "anchor_turn"}),
                on=["conv_id", "anchor_turn"])
            exp = exp.sort_values(["_rid", "person"], kind="mergesort",
                                  ignore_index=True)
            exp["slot_idx"] = exp.groupby(
                "_rid", sort=False).cumcount().astype("int32")
            parts.append(_table(exp, exp["person"].to_numpy(object),
                                exp["obj"].to_numpy(object)))
    if len(state) and is_plu_pair.any():
        # v34: anchor like the v32 branch, then the ORDERED-PAIR join —
        # members × members on the anchor turn, diagonal dropped,
        # slot_idx = the SUBJECT member's lexicographic rank
        turn_set = state.drop_duplicates()
        pturns = (turn_set[["conv_id", "turn_idx"]].drop_duplicates()
                  .assign(anchor_turn=lambda d: d["turn_idx"])
                  .sort_values("turn_idx", kind="mergesort",
                               ignore_index=True))
        plu = _payload(df.loc[is_plu_pair]).reset_index(drop=True)
        plu["_rid"] = np.arange(len(plu))
        plu = plu.sort_values("turn_idx", kind="mergesort",
                              ignore_index=True)
        out = pd.merge_asof(plu, pturns, on="turn_idx", by="conv_id",
                            direction="backward",
                            allow_exact_matches=False)
        out = out[out["anchor_turn"].notna()]
        if len(out):
            out = out.assign(anchor_turn=out["anchor_turn"].astype(
                turn_set["turn_idx"].dtype))
            mem = turn_set.rename(columns={"turn_idx": "anchor_turn"})
            exp = out.merge(mem, on=["conv_id", "anchor_turn"])
            exp = exp.sort_values(["_rid", "person"], kind="mergesort",
                                  ignore_index=True)
            exp["slot_idx"] = exp.groupby(
                "_rid", sort=False).cumcount().astype("int32")
            pairs = exp.merge(
                mem.rename(columns={"person": "person_y"}),
                on=["conv_id", "anchor_turn"])
            pairs = pairs[pairs["person"] != pairs["person_y"]]
            pairs = pairs.sort_values(
                ["_rid", "person", "person_y"], kind="mergesort",
                ignore_index=True)
            if len(pairs):
                parts.append(_table(
                    pairs, pairs["person"].to_numpy(object),
                    pairs["person_y"].to_numpy(object)))
    pron = _payload(df.loc[is_pron])
    if len(state) and len(pron):
        turn_person = (state.groupby(["conv_id", "turn_idx"], sort=False)
                       ["person"].max().reset_index()
                       .sort_values("turn_idx", kind="mergesort",
                                    ignore_index=True))
        pron = pron.sort_values("turn_idx", kind="mergesort",
                                ignore_index=True)
        out = pd.merge_asof(pron, turn_person, on="turn_idx", by="conv_id",
                            direction="backward",
                            allow_exact_matches=False)
        out = out[out["person"].notna()]
        # object-pronoun rows (own_person set) keep their subject; referent
        # fills the object.  Subject-pronoun rows take the referent as subj
        opron = out["own_person"].notna().to_numpy()
        subj_np = np.where(opron, out["own_person"].to_numpy(object),
                           out["person"].to_numpy(object))
        obj_np = np.where(opron, out["person"].to_numpy(object),
                          out["obj"].to_numpy(object))
        if len(out):
            parts.append(_table(out, subj_np, obj_np))
    # definite-description rows: module-keyed maintainer state (rows with
    # desc_key but no pred), merge_asof by (conv_id, desc_key)
    mstate = df.loc[~df["pred"].notna() & has_dk,
                    ["conv_id", "desc_key", "turn_idx", "person"]]
    desc = _payload(df.loc[is_desc]).join(
        df.loc[is_desc, ["desc_key"]])
    if len(mstate) and len(desc):
        turn_m = (mstate.groupby(["conv_id", "desc_key", "turn_idx"],
                                 sort=False)
                  ["person"].max().reset_index()
                  .sort_values("turn_idx", kind="mergesort",
                               ignore_index=True))
        desc = desc.sort_values("turn_idx", kind="mergesort",
                                ignore_index=True)
        out = pd.merge_asof(desc, turn_m, on="turn_idx",
                            by=["conv_id", "desc_key"],
                            direction="backward",
                            allow_exact_matches=False)
        out = out[out["person"].notna()]
        if len(out):
            # obj null ⇒ object-side descriptor (v15): referent fills the
            # OBJECT, the explicit subject (own_person) stays the subject
            odesc = out["obj"].isna().to_numpy()
            subj_np = np.where(odesc, out["own_person"].to_numpy(object),
                               out["person"].to_numpy(object))
            obj_np = np.where(odesc, out["person"].to_numpy(object),
                              out["obj"].to_numpy(object))
            parts.append(_table(out, subj_np, obj_np))
    if not parts:
        return S.TRIPLES_SURFACE.empty_table()
    return pa.concat_tables(parts)


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


# Resolve-exchange dictionary shipping: every string column of the narrow
# schema is vocabulary-drawn (person names, preds, kinds, module keys) or
# block-local-repetitive (conv_id — whole conversations land in one input
# block), so the exchange ships int32 indices + one small dictionary per
# block instead of repeated strings (~2-3x fewer shuffled bytes at the
# 64M-turn scale).  Decoded ONCE per bucket shard in _resolve_bucket;
# NULLs (the row-class discriminators) survive as null indices.
_NARROW_DICT_COLS = ("conv_id", "person", "pred", "obj", "obj_kind",
                     "aspect", "clause", "desc_key")


def _encode_narrow(t: pa.Table) -> pa.Table:
    # combine_chunks FIRST: a chunked dictionary column carries (and
    # ships) one dictionary copy PER CHUNK, and extraction output is many
    # small per-template chunks (measured 10x size blowup without this)
    t = t.combine_chunks()
    for name in _NARROW_DICT_COLS:
        i = t.schema.get_field_index(name)
        t = t.set_column(i, name, pc.dictionary_encode(t.column(name)))
    return t


def _decode_narrow(t: pa.Table) -> pa.Table:
    """Inverse of _encode_narrow, tolerant of already-plain input (the
    per-conversation reference path and tests feed plain strings)."""
    for f in t.schema:
        if pa.types.is_dictionary(f.type):
            i = t.schema.get_field_index(f.name)
            t = t.set_column(i, f.name, t.column(f.name).cast(
                f.type.value_type))
    return t


def _with_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    import pandas as pd
    h = pd.util.hash_array(batch.column("conv_id").to_numpy(
        zero_copy_only=False))
    # int32 key: n_buckets is operator-config-sized (≤ millions), and the
    # key column ships with every exchange row
    return batch.append_column(
        "bucket", pa.array((h % n_buckets).astype("int32")))


def _passthrough_triples(t: pa.Table) -> pa.Table:
    """Non-pronoun events (subj AND obj NOT NULL) are already final
    surface triples; decoding the dictionary categoricals back to plain
    strings happens here, AFTER the store hop, so the materialized events
    stay in their compact layout.  (NULL subj ⇔ subject-pronoun event;
    NULL obj ⇔ object-pronoun event — both resolve in Stage B.
    obj_kind='unknown' rows are the kind-recovery overlay's input, not
    surface triples — excluded here.)"""
    keep = pc.and_(
        pc.and_(pc.is_valid(t.column("subj")),
                pc.is_valid(t.column("obj"))),
        pc.not_equal(t.column("obj_kind").cast(pa.string()),
                     R.UNKNOWN_KIND))
    return (t.filter(keep).drop_columns(["desc_key"])
            .cast(S.TRIPLES_SURFACE))


def _resolve_subset(t: pa.Table, n_buckets: int) -> pa.Table:
    """Rows the resolver actually needs, projected to the narrow shuffle
    schema: pronoun events keep their triple payload (pred/obj/obj_kind);
    person-carrying triples collapse to a single ``person`` state value.
    Everything else skips the shuffle entirely, and no wide or redundant
    column ever enters it."""
    return _encode_narrow(
        _with_bucket(_resolve_subset_plain(t), n_buckets))


def _resolve_subset_plain(t: pa.Table) -> pa.Table:
    """_resolve_subset before encoding/bucketing — the plain narrow rows.
    Exposed separately so the fused resolve+kind-recovery exchange
    (``kindrec.extract_with_recovery``) can concatenate its own tagged
    rows into the SAME exchange before the one encode/bucket step."""
    dk_s = t.column("desc_key").cast(pa.string())
    is_desc = pc.and_(pc.is_null(t.column("subj")), pc.is_valid(dk_s))
    # v15 object-side descriptors: subj ∧ ¬obj ∧ desc_key — object
    # pronouns keep subj ∧ ¬obj ∧ ¬desc_key
    is_odesc = pc.and_(pc.and_(pc.is_valid(t.column("subj")),
                               pc.is_null(t.column("obj"))),
                       pc.is_valid(dk_s))
    is_spron = pc.and_(pc.is_null(t.column("subj")), pc.is_null(dk_s))
    is_opron = pc.and_(pc.and_(pc.is_valid(t.column("subj")),
                               pc.is_null(t.column("obj"))),
                       pc.is_null(dk_s))
    is_pron = pc.or_(is_spron, is_opron)
    needs_res = pc.or_(pc.or_(is_pron, is_desc), is_odesc)
    # decode the dictionary categoricals once per batch (post store hop)
    subj_s = t.column("subj").cast(pa.string())
    obj_s = t.column("obj").cast(pa.string())
    pred_s = t.column("pred").cast(pa.string())
    sk_s = t.column("subj_kind").cast(pa.string())
    ok_s = t.column("obj_kind").cast(pa.string())
    person_val = pc.if_else(
        pc.and_(pc.equal(ok_s, "person"), pc.is_valid(obj_s)),
        obj_s,
        pc.if_else(pc.equal(sk_s, "person"),
                   subj_s, pa.nulls(t.num_rows, pa.string())))
    # subject-pronoun rows never contribute state; object-pronoun rows
    # contribute their explicit SUBJECT (person_val == subj — the rule
    # pack guarantees object-pronoun templates have person subjects,
    # which doubles as the row's opron discriminator downstream);
    # descriptor rows contribute their explicit person OBJECT.
    # Untyped-mention overlay rows (obj_kind='unknown') are not template
    # matches: they contribute NO state and never enter the resolver.
    person_val = pc.if_else(
        pc.or_(is_spron, pc.equal(ok_s, R.UNKNOWN_KIND)),
        pa.nulls(t.num_rows, pa.string()), person_val)
    # key-keyed descriptor state (the definite-description analog of
    # person state, generic over DESC_STATE_PREDS since v16): every
    # explicit maintains/manages row ships (key=obj → value=subj) as a
    # SEPARATE narrow state row below, because the same event's
    # pronoun-referent contribution may be a DIFFERENT slot (manages
    # feeds its OBJECT to person state but its SUBJECT to manager
    # state).  Narrow-schema discriminators downstream:
    # pred∧desc_key ⇒ descriptor row (obj valid ⇒ subject-side,
    # referent fills SUBJ; obj null ⇒ object-side v15, referent fills
    # OBJ and `person` is the explicit subject); pred∧¬desc_key ⇒
    # pronoun row; ¬pred∧desc_key ⇒ descriptor state (NOT person
    # state).  Key spaces are disjoint by surface shape (module keys
    # are lowercase dotted, person keys capitalized), so one state map
    # serves every family.
    nulls = pa.nulls(t.num_rows, pa.string())
    is_state_ev = pc.and_(
        pc.and_(pc.is_valid(subj_s), pc.is_valid(obj_s)),
        pc.is_in(pred_s, value_set=pa.array(sorted(R.DESC_STATE_PREDS))))
    dk_val = pc.if_else(pc.or_(is_desc, is_odesc), dk_s, nulls)
    mask = pc.or_(needs_res, pc.is_valid(person_val))
    mst_rows = pa.table({
        "conv_id": t.column("conv_id"),
        "turn_idx": t.column("turn_idx"),
        "person": subj_s,
        "pred": nulls,
        "obj": nulls,
        "obj_kind": nulls,
        "sent_idx": t.column("sent_idx"),
        "negated": t.column("negated"),
        "in_question": t.column("in_question"),
        "is_past": t.column("is_past"),
        "aspect": nulls,
        "since_year": pa.nulls(t.num_rows, pa.int32()),
        "hedged": t.column("hedged"),
        "slot_idx": pa.nulls(t.num_rows, pa.int32()),
        "clause": nulls,
        "desc_key": obj_s,
    }).filter(is_state_ev)
    # v28 org-keyed descriptor state: explicit works_at(person, org)
    # rows ship ONE extra narrow state row keyed by the NORMALIZED org
    # surface (normalize runs over just this subset, not the batch)
    is_org_state = pc.and_(
        pc.and_(pc.is_valid(subj_s), pc.is_valid(obj_s)),
        pc.and_(pc.equal(pred_s, R.ORG_STATE_PRED),
                pc.equal(ok_s, "org")))
    org_idx = pc.indices_nonzero(pc.fill_null(is_org_state, False))
    if len(org_idx):
        from .link import normalize_arrays
        o_obj = obj_s.take(org_idx)
        okey = normalize_arrays(
            pa.array(["org"] * len(org_idx)), o_obj)
        n_o = len(org_idx)
        onull = pa.nulls(n_o, pa.string())
        ost_rows = pa.table({
            "conv_id": t.column("conv_id").take(org_idx),
            "turn_idx": t.column("turn_idx").take(org_idx),
            "person": subj_s.take(org_idx),
            "pred": onull,
            "obj": onull,
            "obj_kind": onull,
            "sent_idx": t.column("sent_idx").take(org_idx),
            "negated": t.column("negated").take(org_idx),
            "in_question": t.column("in_question").take(org_idx),
            "is_past": t.column("is_past").take(org_idx),
            "aspect": onull,
            "since_year": pa.nulls(n_o, pa.int32()),
            "hedged": t.column("hedged").take(org_idx),
            "slot_idx": pa.nulls(n_o, pa.int32()),
            "clause": onull,
            "desc_key": okey,
        })
    else:
        ost_rows = None
    # v38 org REFERENT state: every fully-explicit row with an org-kind
    # slot commits its org SURFACE under the reserved ORG_REF_KEY (the
    # object slot shadows the subject slot; resolved/pronoun/plural rows
    # have a NULL slot and never qualify)
    org_val = pc.if_else(
        pc.equal(ok_s, "org"), obj_s,
        pc.if_else(pc.equal(sk_s, "org"), subj_s,
                   pa.nulls(t.num_rows, pa.string())))
    is_org_ref = pc.and_(
        pc.and_(pc.is_valid(subj_s), pc.is_valid(obj_s)),
        pc.is_valid(org_val))
    ref_idx = pc.indices_nonzero(pc.fill_null(is_org_ref, False))
    if len(ref_idx):
        n_r = len(ref_idx)
        rnull = pa.nulls(n_r, pa.string())
        orf_rows = pa.table({
            "conv_id": t.column("conv_id").take(ref_idx),
            "turn_idx": t.column("turn_idx").take(ref_idx),
            "person": org_val.take(ref_idx),
            "pred": rnull,
            "obj": rnull,
            "obj_kind": rnull,
            "sent_idx": t.column("sent_idx").take(ref_idx),
            "negated": t.column("negated").take(ref_idx),
            "in_question": t.column("in_question").take(ref_idx),
            "is_past": t.column("is_past").take(ref_idx),
            "aspect": rnull,
            "since_year": pa.nulls(n_r, pa.int32()),
            "hedged": t.column("hedged").take(ref_idx),
            "slot_idx": pa.nulls(n_r, pa.int32()),
            "clause": rnull,
            "desc_key": pa.array([R.ORG_REF_KEY] * n_r, pa.string()),
        })
    else:
        orf_rows = None
    narrow = pa.table({
        "conv_id": t.column("conv_id"),
        "turn_idx": t.column("turn_idx"),
        "person": person_val,
        "pred": pc.if_else(needs_res, pred_s, nulls),
        "obj": pc.if_else(pc.or_(is_spron, is_desc), obj_s, nulls),
        "obj_kind": pc.if_else(needs_res, ok_s, nulls),
        "sent_idx": t.column("sent_idx"),
        "negated": t.column("negated"),
        "in_question": t.column("in_question"),
        "is_past": t.column("is_past"),
        "aspect": pc.if_else(needs_res,
                             t.column("aspect").cast(pa.string()), nulls),
        # v33: the temporal adjunct is a pronoun-row payload attribute
        # (state rows ship null — bitmap-only, the slot_idx discipline)
        "since_year": pc.if_else(needs_res, t.column("since_year"),
                                 pa.nulls(t.num_rows, pa.int32())),
        # v36: the hedge bit is a payload attribute carried like negated
        "hedged": t.column("hedged"),
        # pronoun slots inside multi-relation constructs carry their own
        # slot/clause (e.g. "Bob and She use x daily" → slot_idx 1); only
        # PRONOUN rows need them — state rows ship null (bitmap-only), so
        # the exchange stays as narrow as before v8
        "slot_idx": pc.if_else(needs_res, t.column("slot_idx"),
                               pa.nulls(t.num_rows, pa.int32())),
        "clause": pc.if_else(needs_res, t.column("clause").cast(pa.string()),
                             nulls),
        "desc_key": dk_val,
    }).filter(mask)
    parts = [narrow, mst_rows]
    if ost_rows is not None:
        parts.append(ost_rows)
    if orf_rows is not None:
        parts.append(orf_rows)
    return pa.concat_tables(parts)


def extract_triples(transcripts_ds, *, num_partitions: int | None = None,
                    resolve_buckets: int | None = DEFAULT_RESOLVE_BUCKETS,
                    materialize_events: bool = True,
                    max_resolve_events_per_conv: int | None = None,
                    extra_templates: list[tuple] | None = None,
                    extra_multi_templates: list[tuple] | None = None):
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
    return extract_triples_and_events(
        transcripts_ds, num_partitions=num_partitions,
        resolve_buckets=resolve_buckets,
        materialize_events=materialize_events,
        max_resolve_events_per_conv=max_resolve_events_per_conv,
        extra_templates=extra_templates,
        extra_multi_templates=extra_multi_templates)[0]


def extract_triples_and_events(
        transcripts_ds, *, num_partitions: int | None = None,
        resolve_buckets: int | None = DEFAULT_RESOLVE_BUCKETS,
        materialize_events: bool = True,
        max_resolve_events_per_conv: int | None = None,
        extra_templates: list[tuple] | None = None,
        extra_multi_templates: list[tuple] | None = None):
    """extract_triples, but also returns the (materialized) EVENTS Dataset
    so overlay passes (kind recovery) can reuse the stored events instead
    of re-extracting the corpus."""
    events = transcripts_ds.map_batches(
        lambda t: extract_events(t, extra_templates, extra_multi_templates),
        batch_format="pyarrow", zero_copy_batch=True)
    if resolve_buckets is None:
        return (events.groupby("conv_id").map_groups(
            _resolve_group, batch_format="pyarrow"), events)
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
    return passthrough.union(resolved), events
