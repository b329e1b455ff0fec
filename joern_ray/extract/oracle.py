"""Reference (oracle) extractor: plain-Python, one conversation at a time.

This is the in-repo analog of the reference fork's per-method dependency-JSON
extractor (``semanticcpg/.../dependencyJsonGenerator/DependencyJsonGenerator.scala:83-140``)
plus its comparison harness (``compareJson.py:10-50``): a deliberately simple,
serial implementation of the extraction contract in
:mod:`joern_ray.functions.rules`, used only as the correctness oracle.  The
distributed pipeline (joern_ray.stages) implements the same contract
independently with vectorized Arrow kernels; pytest asserts P/R >= 0.95
between the two (BASELINE.md target).
"""

from __future__ import annotations

from collections import defaultdict

from ..functions import rules as R


def extract_conversation(turns: list[dict]) -> list[dict]:
    """Extract surface triples from one conversation.

    ``turns``: list of dicts with conv_id/turn_idx/role/text/tool, in any
    order (sorted internally by turn_idx — stable turn ordering invariant).
    Returns surface-level triple dicts.
    """
    import re as _re
    turns = sorted(turns, key=lambda r: r["turn_idx"])
    out: list[dict] = []
    # committed person contributions of the latest person-bearing turn:
    # the singular referent is max(last_persons); the v32 plural pronoun
    # expands over the WHOLE set (one state stream serves both rules)
    last_persons: set[str] = set()
    last_person: str | None = None   # == max(last_persons) or None
    cur_turn: int | None = None
    cur_persons: set[str] = set()    # person contributions this turn
    last_maint: dict[str, str] = {}  # committed module -> maintainer
    cur_maint: dict[str, str] = {}   # this turn's max maintainer per module
    for row in turns:
        conv_id, t = row["conv_id"], row["turn_idx"]
        if t != cur_turn:
            if cur_persons:
                last_persons = cur_persons
                last_person = max(last_persons)
            if cur_maint:
                last_maint.update(cur_maint)
            cur_turn, cur_persons, cur_maint = t, set(), {}
        if row.get("role") == "tool" and row.get("tool"):
            out.append(dict(conv_id=conv_id, turn_idx=t, subj=conv_id,
                            pred=R.INVOKED_PRED, obj=row["tool"],
                            subj_kind="conv", obj_kind="tool",
                            sent_idx=0, negated=False, in_question=False,
                            is_past=False, aspect=R.ASPECT_SIMPLE,
                            since_year=None, hedged=False))
            continue
        text = row.get("text") or ""
        # shared segmentation contract (rules.split_sentences):
        # mark + split + quote-parity repair
        sents = R.split_sentences(text)
        for si, sent in enumerate(sents):
            since_m = _re.search(R.SINCE_RE, sent)
            attrs = dict(sent_idx=si, negated=R.NEGATION_MARK in sent,
                         in_question=sent.endswith(R.QUESTION_MARK),
                         is_past=bool(
                             _re.search(R.PAST_RE, sent)
                             and not _re.search(R.PRES_PASSIVE_RE, sent)
                             and not _re.search(R.PRES_PERFECT_RE, sent)),
                         aspect=(R.ASPECT_PROG
                                 if _re.search(R.PROG_RE, sent)
                                 else R.ASPECT_PERF
                                 if _re.search(R.PERF_RE, sent)
                                 else R.ASPECT_SIMPLE),
                         since_year=(int(since_m.group("year"))
                                     if since_m else None),
                         # v36 hedge attribute (NEGATION_MARK discipline)
                         hedged=R.HEDGE_MARK in sent)
            matched = False
            for pred, rx, obj_kind in R.COMPILED_PRONOUN_TEMPLATES:
                m = rx.match(sent)
                if m:
                    matched = True
                    if last_person is not None:
                        out.append(dict(conv_id=conv_id, turn_idx=t,
                                        subj=last_person, pred=pred,
                                        obj=m.group("obj"),
                                        subj_kind="person",
                                        obj_kind=obj_kind, **attrs,
                                        slot_idx=R.DEFAULT_SLOT_IDX,
                                        clause=R.DEFAULT_CLAUSE))
                    break
            if matched:
                continue

            # PLURAL-pronoun templates (v32): "They ..." expands to one
            # triple per distinct member of the anchor turn's committed
            # person set, slot_idx = lexicographic rank, clause 'plural';
            # resolved rows feed no state (so plural chains co-refer)
            for pred, rx, ok in R.COMPILED_PLURAL_PRONOUN_TEMPLATES:
                m = rx.match(sent)
                if m:
                    matched = True
                    for slot, mem in enumerate(sorted(last_persons)):
                        out.append(dict(conv_id=conv_id, turn_idx=t,
                                        subj=mem, pred=pred,
                                        obj=m.group("obj"),
                                        subj_kind="person",
                                        obj_kind=ok, **attrs,
                                        slot_idx=slot,
                                        clause=R.PLURAL_CLAUSE))
                    break
            if matched:
                continue

            # PLURAL-RECIPROCAL templates (v34): "They met." expands to
            # one triple per ORDERED PAIR of distinct anchor-set
            # members; slot_idx = the subject's lexicographic rank;
            # resolved rows feed no state (so the set carries over)
            for pred, rx in R.COMPILED_PLURAL_RECIP_TEMPLATES:
                m = rx.match(sent)
                if m:
                    matched = True
                    mems = sorted(last_persons)
                    for i, a in enumerate(mems):
                        for b in mems:
                            if b != a:
                                out.append(dict(
                                    conv_id=conv_id, turn_idx=t,
                                    subj=a, pred=pred, obj=b,
                                    subj_kind="person",
                                    obj_kind="person", **attrs,
                                    slot_idx=i,
                                    clause=R.PLURAL_RECIP_CLAUSE))
                    break
            if matched:
                continue

            def _commit(p):
                if p is not None:
                    cur_persons.add(p)

            def _commit_maint(subj, pred, obj, obj_kind=None):
                """Explicit maintains/manages rows feed the key-keyed
                descriptor state (definite-description resolution;
                pronoun-resolved rows never reach here — resolution stays
                a pure function of the committed stream).  Key spaces are
                disjoint by surface shape, one dict serves every family.
                v28: explicit works_at(person, org) rows feed the
                ORG-keyed family under the NORMALIZED org surface."""
                if pred in R.DESC_STATE_PREDS:
                    key = obj
                elif pred == R.ORG_STATE_PRED and obj_kind == "org":
                    key = R.normalize_surface("org", obj)
                else:
                    return
                m = cur_maint.get(key)
                if m is None or subj > m:
                    cur_maint[key] = subj

            def _commit_org(subj, sk, obj, ok):
                """v38 org REFERENT state: every fully-explicit row with
                an org-kind slot commits its org SURFACE under the
                reserved ORG_REF_KEY (object shadows subject; turn max)."""
                org = (obj if ok == "org"
                       else subj if sk == "org" else None)
                if org is None:
                    return
                m = cur_maint.get(R.ORG_REF_KEY)
                if m is None or org > m:
                    cur_maint[R.ORG_REF_KEY] = org

            # ORG-pronoun templates (v38): "It acquired X." resolves to
            # the committed org surface of the latest strictly-earlier
            # turn; the resolved row (incl. its explicit org object)
            # feeds NO state of any family
            for pred, rx, ok in R.COMPILED_ORG_PRONOUN_TEMPLATES:
                m = rx.match(sent)
                if m:
                    matched = True
                    ref = last_maint.get(R.ORG_REF_KEY)
                    if ref is not None:
                        out.append(dict(conv_id=conv_id, turn_idx=t,
                                        subj=ref, pred=pred,
                                        obj=m.group("obj"),
                                        subj_kind="org",
                                        obj_kind=ok, **attrs,
                                        slot_idx=R.DEFAULT_SLOT_IDX,
                                        clause=R.ORG_PRON_CLAUSE))
                    break
            if matched:
                continue

            # object-pronoun templates ("Alice met with her."): the
            # explicit subject anchors the relation AND feeds referent
            # state; the object resolves to the committed referent
            for pred, rx, ok in R.COMPILED_PRONOUN_OBJECT_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                subj = m.group("subj")
                if subj in R.SUBJ_PRONOUNS:
                    break
                matched = True
                if last_person is not None:
                    out.append(dict(conv_id=conv_id, turn_idx=t,
                                    subj=subj, pred=pred,
                                    obj=last_person, subj_kind="person",
                                    obj_kind=ok, **attrs,
                                    slot_idx=R.DEFAULT_SLOT_IDX,
                                    clause=R.DEFAULT_CLAUSE))
                _commit(subj)
                break
            if matched:
                continue

            # object pronouns INSIDE quoted speech (v18): quoting-turn
            # scope; inner subject anchors + commits; speaker never does
            for pred, rx, ok in R.COMPILED_QUOTED_PRONOUN_OBJECT_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                subj = m.group("subj")
                if subj in R.SUBJ_PRONOUNS:
                    break
                matched = True
                if last_person is not None:
                    out.append(dict(conv_id=conv_id, turn_idx=t,
                                    subj=subj, pred=pred,
                                    obj=last_person, subj_kind="person",
                                    obj_kind=ok, **attrs,
                                    slot_idx=R.DEFAULT_SLOT_IDX,
                                    clause=R.QUOTED_CLAUSE))
                _commit(subj)
                break
            if matched:
                continue

            for pred, rx, sk, ok in R.COMPILED_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                subj, obj = m.group("subj"), m.group("obj")
                if subj in R.SUBJ_PRONOUNS:
                    continue
                out.append(dict(conv_id=conv_id, turn_idx=t, subj=subj,
                                pred=pred, obj=obj, subj_kind=sk,
                                obj_kind=ok, **attrs,
                                slot_idx=R.DEFAULT_SLOT_IDX,
                                clause=R.DEFAULT_CLAUSE))
                # referent update: per-sentence person slot (obj shadows
                # subj), committed at the next turn boundary; ties within a
                # turn take the lexicographic max (rules.py contract)
                _commit(obj if ok == "person"
                        else subj if sk == "person" else None)
                _commit_maint(subj, pred, obj, ok)
                _commit_org(subj, sk, obj, ok)
                break
            # multi-relation templates (disjoint from single templates by
            # anchors): every emitted slot feeds referent state per-row
            for name, rx, emissions in R.COMPILED_MULTI_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                for pred, subj_g, sk, obj_g, ok, slot, clause in emissions:
                    subj, obj = m.group(subj_g), m.group(obj_g)
                    obj_is_pron = (ok == "person"
                                   and obj in R.OBJ_PRONOUNS)
                    if subj in R.SUBJ_PRONOUNS:
                        # pronoun in a coordinated person slot: resolve to
                        # the committed referent, keep the emission's
                        # slot/clause, contribute no state.  Both-pronoun
                        # emissions drop (v21 rule).
                        if (sk == "person" and last_person is not None
                                and not obj_is_pron):
                            out.append(dict(
                                conv_id=conv_id, turn_idx=t,
                                subj=last_person, pred=pred, obj=obj,
                                subj_kind=sk, obj_kind=ok, **attrs,
                                slot_idx=slot, clause=clause))
                        continue
                    if obj_is_pron:
                        # v21 object-pronoun rule: the referent fills the
                        # OBJECT; the explicit subject feeds state (the
                        # object-pronoun discipline)
                        if last_person is not None:
                            out.append(dict(
                                conv_id=conv_id, turn_idx=t, subj=subj,
                                pred=pred, obj=last_person, subj_kind=sk,
                                obj_kind=ok, **attrs,
                                slot_idx=slot, clause=clause))
                        _commit(subj)
                        continue
                    out.append(dict(conv_id=conv_id, turn_idx=t, subj=subj,
                                    pred=pred, obj=obj, subj_kind=sk,
                                    obj_kind=ok, **attrs,
                                    slot_idx=slot, clause=clause))
                    _commit(obj if ok == "person"
                            else subj if sk == "person" else None)
                    _commit_maint(subj, pred, obj, ok)
                    _commit_org(subj, sk, obj, ok)
                break
            # LIST templates (open-ended coordination, v12): split the
            # captured head on the shared separator; one emission per
            # member, slot_idx = list position
            for name, rx, pred, mk, ok, clause in R.COMPILED_LIST_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                obj = m.group("obj")
                members = m.group("list").split(R.LIST_SEP) + [
                    m.group("last")]
                for slot, mem in enumerate(members):
                    if mem in R.SUBJ_PRONOUNS:
                        if mk == "person" and last_person is not None:
                            out.append(dict(
                                conv_id=conv_id, turn_idx=t,
                                subj=last_person, pred=pred, obj=obj,
                                subj_kind=mk, obj_kind=ok, **attrs,
                                slot_idx=slot, clause=clause))
                        continue
                    out.append(dict(conv_id=conv_id, turn_idx=t, subj=mem,
                                    pred=pred, obj=obj, subj_kind=mk,
                                    obj_kind=ok, **attrs,
                                    slot_idx=slot, clause=clause))
                    _commit(obj if ok == "person"
                            else mem if mk == "person" else None)
                    _commit_maint(mem, pred, obj, ok)
                    _commit_org(mem, mk, obj, ok)
                break
            # definite-description templates (v12): the descriptor resolves
            # against the committed module-keyed maintainer state; the
            # explicit person object feeds referent state; the resolved row
            # feeds no state (the pronoun-resolution discipline)
            for pred, rx, ok, clause in R.COMPILED_DESC_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                ref = last_maint.get(m.group("key"))
                obj = m.group("obj")
                if ref is not None:
                    out.append(dict(conv_id=conv_id, turn_idx=t, subj=ref,
                                    pred=pred, obj=obj, subj_kind="person",
                                    obj_kind=ok, **attrs,
                                    slot_idx=R.DEFAULT_SLOT_IDX,
                                    clause=clause))
                if ok == "person":
                    _commit(obj)
                break
            # ORG-keyed descriptors (v28): key = lowercased org base,
            # resolved against the normalized-surface works_at state;
            # the explicit person object feeds referent state as usual
            for pred, rx, ok, clause in R.COMPILED_DESC_ORG_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                ref = last_maint.get(m.group("key").lower())
                obj = m.group("obj")
                if ref is not None:
                    out.append(dict(conv_id=conv_id, turn_idx=t, subj=ref,
                                    pred=pred, obj=obj, subj_kind="person",
                                    obj_kind=ok, **attrs,
                                    slot_idx=R.DEFAULT_SLOT_IDX,
                                    clause=clause))
                if ok == "person":
                    _commit(obj)
                break
            # OBJECT-side definite descriptions (v15): the object resolves
            # against the committed maintainer state; the explicit person
            # subject feeds referent state regardless of resolvability
            # (the object-pronoun discipline); pronoun subjects skip
            for pred, rx, clause in R.COMPILED_DESC_OBJ_TEMPLATES:
                m = rx.match(sent)
                if m is None:
                    continue
                subj = m.group("subj")
                if subj in R.SUBJ_PRONOUNS:
                    break
                ref = last_maint.get(m.group("key"))
                if ref is not None:
                    out.append(dict(conv_id=conv_id, turn_idx=t, subj=subj,
                                    pred=pred, obj=ref, subj_kind="person",
                                    obj_kind="person", **attrs,
                                    slot_idx=R.DEFAULT_SLOT_IDX,
                                    clause=clause))
                _commit(subj)
                break
    return out


def extract_all(rows: list[dict]) -> list[dict]:
    """Serial oracle over a whole corpus given arbitrary row order."""
    by_conv: dict[str, list[dict]] = defaultdict(list)
    for r in rows:
        by_conv[r["conv_id"]].append(r)
    out: list[dict] = []
    for conv_id in sorted(by_conv):
        out.extend(extract_conversation(by_conv[conv_id]))
    return out


def triple_key(d: dict) -> tuple:
    return (d["conv_id"], d["turn_idx"], d["subj"], d["pred"], d["obj"])


def precision_recall(predicted: list[dict], truth: list[dict]) -> tuple[float, float]:
    """Set-based P/R on (conv_id, turn_idx, subj, pred, obj) — the model of
    the fork's per-function JSON diff (compareJson.py)."""
    ps = {triple_key(d) for d in predicted}
    ts = {triple_key(d) for d in truth}
    if not ps or not ts:
        return (1.0 if ps == ts else 0.0,) * 2
    inter = len(ps & ts)
    return inter / len(ps), inter / len(ts)
