"""Findings rule pack — the scan battery analog.

The reference runs 50 predicate queries over the graph and emits FINDING
nodes (``console/src/main/scala/io/joern/console/scan/ScanPass.scala:10-16``,
rule defs in ``querydb/src/main/scala/io/joern/scanners/**``); findings are
reported grouped per rule (``console/scan/package.scala:60-119``).  Here each
rule is a Dataset→Dataset predicate over transcripts (or an aggregation for
conversation-level rules) and the scan is their union — append-only diffs,
exactly the overlay discipline.

``snippets`` is the CodeDumper analog (``semanticcpg/.../codedumper/
CodeDumper.scala``): joins a finding back to its surrounding turns by
(conv_id, turn_idx±1) via a fully distributed conversation-bucket cogroup
join — findings scale WITH the corpus, so nothing is ever collected on the
driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import synth
from .text import ascii_trim

FINDINGS = pa.schema([
    ("rule", pa.string()),
    ("severity", pa.string()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),      # null for conversation-level rules
    ("evidence", pa.string()),
])

_ITEMS_RE = r"^result: ok \((?P<n>[0-9]+) items\)$"
_TOOL_ANNOUNCE_RE = r"^Calling (?P<t>[a-z0-9_]+) now\.$"
LARGE_RESULT_MIN = 90
SMALL_RESULT_MAX = 5
LONG_TURN_TOKENS = 12
ASSISTANT_LONG_TOKENS = 14
TERSE_TURN_TOKENS = 3
REPEAT_CALLER_MIN = 4
LONG_CONV_TURNS = 23
SHORT_CONV_TURNS = 7
QUESTION_HEAVY_MIN = 2
NEGATION_HEAVY_MIN = 2
QUOTE_HEAVY_MIN = 2
TOOL_HEAVY_FACTOR = 3
HOT_ENTITY_MIN = 200
LONELY_ENTITY_MAX = 1
MULTI_EMPLOYER_MIN = 3
MODULE_HOTSPOT_MIN = 50


def _token_counts(col):
    """Whitespace token count on the ascii-trimmed text (0 for blank) —
    the shared contract of long-turn / terse-turn / assistant-long."""
    trimmed = ascii_trim(col)
    return pc.if_else(pc.equal(trimmed, ""), 0,
                      pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1))


def _table(rule, severity, conv, tidx, evidence, n) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([rule] * n, pa.string()),
         pa.array([severity] * n, pa.string()),
         conv.cast(pa.string()),
         tidx if not isinstance(tidx, type(None)) else pa.nulls(n, pa.int32()),
         evidence.cast(pa.string())],
        schema=FINDINGS)


def _rule_large_tool_result(batch: pa.Table) -> pa.Table:
    ex = pc.extract_regex(batch.column("text"), _ITEMS_RE)
    items = pc.cast(pc.struct_field(ex, "n"), pa.int64())
    mask = pc.fill_null(pc.and_(
        pc.equal(batch.column("role"), "tool"),
        pc.greater(items, LARGE_RESULT_MIN)), False)
    sub = batch.filter(mask)
    return _table("large-tool-result", "warning", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("tool"), sub.num_rows)


def _rule_long_turn(batch: pa.Table) -> pa.Table:
    mask = pc.greater(_token_counts(batch.column("text")), LONG_TURN_TOKENS)
    sub = batch.filter(mask)
    ev = pc.cast(_token_counts(sub.column("text")), pa.string())
    return _table("long-turn", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()), ev, sub.num_rows)


def _rule_terse_turn(batch: pa.Table) -> pa.Table:
    """Non-blank turn of at most TERSE_TURN_TOKENS whitespace tokens."""
    nt = _token_counts(batch.column("text"))
    mask = pc.and_(pc.greater(nt, 0), pc.less_equal(nt, TERSE_TURN_TOKENS))
    sub = batch.filter(mask)
    ev = pc.cast(_token_counts(sub.column("text")), pa.string())
    return _table("terse-turn", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()), ev, sub.num_rows)


def _rule_assistant_long_answer(batch: pa.Table) -> pa.Table:
    mask = pc.fill_null(pc.and_(
        pc.equal(batch.column("role"), "assistant"),
        pc.greater(_token_counts(batch.column("text")),
                   ASSISTANT_LONG_TOKENS)), False)
    sub = batch.filter(mask)
    ev = pc.cast(_token_counts(sub.column("text")), pa.string())
    return _table("assistant-long-answer", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()), ev, sub.num_rows)


def _rule_assistant_question(batch: pa.Table) -> pa.Table:
    mask = pc.fill_null(pc.and_(
        pc.equal(batch.column("role"), "assistant"),
        pc.ends_with(batch.column("text"), "?")), False)
    sub = batch.filter(mask)
    return _table("assistant-question", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_pronoun_turn(batch: pa.Table) -> pa.Table:
    """Turn opening with an unresolved-reference pronoun (subject or
    possessive)."""
    mask = pc.fill_null(pc.match_substring_regex(
        batch.column("text"), r"^(She|He|Her|His) "), False)
    sub = batch.filter(mask)
    return _table("pronoun-turn", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_tool_announce(batch: pa.Table) -> pa.Table:
    """Assistant tool-invocation announcement; evidence = the tool name."""
    ex = pc.extract_regex(batch.column("text"), _TOOL_ANNOUNCE_RE)
    tool = pc.struct_field(ex, "t")
    mask = pc.fill_null(pc.is_valid(tool), False)
    sub = batch.filter(mask)
    return _table("tool-announce", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  tool.filter(mask), sub.num_rows)


def _rule_numeric_turn(batch: pa.Table) -> pa.Table:
    mask = pc.fill_null(pc.match_substring_regex(
        batch.column("text"), r"[0-9]"), False)
    sub = batch.filter(mask)
    return _table("numeric-turn", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_clarification(batch: pa.Table) -> pa.Table:
    mask = pc.fill_null(pc.match_substring(batch.column("text"),
                                           "clarify"), False)
    sub = batch.filter(mask)
    return _table("clarification-request", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_deferred_followup(batch: pa.Table) -> pa.Table:
    mask = pc.fill_null(pc.match_substring(
        batch.column("text"), "follow up with more details"), False)
    sub = batch.filter(mask)
    return _table("deferred-followup", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_acquisition(batch: pa.Table) -> pa.Table:
    mask = pc.match_substring_regex(batch.column("text"),
                                    r"^[A-Z][A-Za-z ]+ acquired ")
    sub = batch.filter(pc.fill_null(mask, False))
    return _table("org-acquisition", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_question_turn(batch: pa.Table) -> pa.Table:
    """User turn ending with '?' (the unansweredness-precursor signal)."""
    mask = pc.fill_null(pc.and_(pc.equal(batch.column("role"), "user"),
                                pc.ends_with(batch.column("text"), "?")),
                        False)
    sub = batch.filter(mask)
    return _table("question-turn", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_negated_fact(batch: pa.Table) -> pa.Table:
    """'no longer' modifier anywhere in a turn — retraction signal."""
    mask = pc.fill_null(pc.match_substring(batch.column("text"),
                                           "no longer "), False)
    sub = batch.filter(mask)
    return _table("negated-fact", "warning", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_empty_turn(batch: pa.Table) -> pa.Table:
    """Whitespace-only text (dirty input, FIXTURES F5)."""
    mask = pc.fill_null(
        pc.equal(ascii_trim(batch.column("text")), ""), False)
    sub = batch.filter(mask)
    return _table("empty-turn", "warning", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("role"), sub.num_rows)


def _rule_meeting(batch: pa.Table) -> pa.Table:
    mask = pc.fill_null(pc.match_substring(batch.column("text"),
                                           " met with "), False)
    sub = batch.filter(mask)
    return _table("person-meeting", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_quoted_claim(batch: pa.Table) -> pa.Table:
    """Second-hand (quoted-speech) facts — provenance-weakening signal;
    the claim's subject is inside the quote, not the speaker (the
    multi-relation grammar's ``clause='quoted'`` construct)."""
    mask = pc.fill_null(pc.match_substring(batch.column("text"),
                                           ' said "'), False)
    sub = batch.filter(mask)
    return _table("quoted-claim", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


_COORD_RE = r"(^| )[A-Z][a-z]+ and [A-Z][a-z]+ (work at|use) "


def _rule_coordinated_subjects(batch: pa.Table) -> pa.Table:
    """Coordinated-subject sentences (one sentence, several relation
    rows with distinct slot_idx)."""
    mask = pc.fill_null(pc.match_substring_regex(batch.column("text"),
                                                 _COORD_RE), False)
    sub = batch.filter(mask)
    return _table("coordinated-subjects", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_appositive_role(batch: pa.Table) -> pa.Table:
    """Appositive role assertions (', the maintainer of ') — the
    sentence carries a second, clause-scoped relation."""
    mask = pc.fill_null(pc.match_substring(batch.column("text"),
                                           ", the maintainer of "), False)
    sub = batch.filter(mask)
    return _table("appositive-role", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_small_tool_result(batch: pa.Table) -> pa.Table:
    ex = pc.extract_regex(batch.column("text"), _ITEMS_RE)
    items = pc.cast(pc.struct_field(ex, "n"), pa.int64())
    mask = pc.fill_null(pc.and_(
        pc.equal(batch.column("role"), "tool"),
        pc.less(items, SMALL_RESULT_MAX)), False)
    sub = batch.filter(mask)
    return _table("small-tool-result", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("tool"), sub.num_rows)


def _rule_bug_report(batch: pa.Table) -> pa.Table:
    """Module bug mention with the module path as evidence (one RE2 scan;
    evidence filtered from the same extraction)."""
    ex = pc.extract_regex(
        batch.column("text"),
        r" reported a bug in (?P<m>[a-z_]+(?:\.[a-z_]+)*)[.?]$")
    mod = pc.struct_field(ex, "m")
    mask = pc.fill_null(pc.is_valid(mod), False)
    sub = batch.filter(mask)
    return _table("bug-report", "warning", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  mod.filter(mask), sub.num_rows)


def _substring_rule(rule: str, severity: str, needle: str):
    """Factory for contains-substring per-turn rules (evidence = text)."""
    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.match_substring(batch.column("text"),
                                               needle), False)
        sub = batch.filter(mask)
        return _table(rule, severity, sub.column("conv_id"),
                      sub.column("turn_idx").cast(pa.int32()),
                      sub.column("text"), sub.num_rows)
    fn.__name__ = f"_rule_{rule.replace('-', '_')}"
    return fn


def _regex_rule(rule: str, severity: str, pattern: str):
    """Factory for RE2 per-turn rules (same pattern mirrored in the
    DuckDB oracle — both engines are RE2-syntax)."""
    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.match_substring_regex(batch.column("text"),
                                                     pattern), False)
        sub = batch.filter(mask)
        return _table(rule, severity, sub.column("conv_id"),
                      sub.column("turn_idx").cast(pa.int32()),
                      sub.column("text"), sub.num_rows)
    fn.__name__ = f"_rule_{rule.replace('-', '_')}"
    return fn


# grammar-construct coverage: one scan rule per relation template the
# extractor understands (the querydb discipline of one query per code
# construct, `querydb/src/main/scala/io/joern/scanners/**`)
_rule_org_departure = _regex_rule(
    "org-departure", "warning", r"(^| )[A-Z][a-z]+ left [A-Z]")
_rule_org_join = _regex_rule(
    "org-join", "info", r"(^| )[A-Z][a-z]+ joined [A-Z]")
_rule_org_partnership = _substring_rule(
    "org-partnership", "info", " partnered with ")
_rule_management_edge = _regex_rule(
    "management-edge", "info", r"(^| )[A-Z][a-z]+ manages [A-Z]")
_rule_relative_clause = _substring_rule(
    "relative-clause", "info", ", who manages ")
_rule_maintainer_claim = _regex_rule(
    "maintainer-claim", "info", r"(^| )[A-Z][a-z]+ maintains ")
_rule_daily_usage = _substring_rule("daily-usage", "info", " daily")
_rule_dotted_module = _regex_rule(
    "dotted-module-mention", "info", r"[a-z_]+\.[a-z_]+")


def _rule_negated_question(batch: pa.Table) -> pa.Table:
    """Retraction phrased as a question — ambiguous-assertion signal
    (both the `negated` and `in_question` attribute kernels fire)."""
    mask = pc.fill_null(pc.and_(
        pc.match_substring(batch.column("text"), "no longer "),
        pc.ends_with(batch.column("text"), "?")), False)
    sub = batch.filter(mask)
    return _table("negated-question", "warning", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _rule_first_turn_question(batch: pa.Table) -> pa.Table:
    """Conversation opened by a direct user question."""
    mask = pc.fill_null(pc.and_(pc.and_(
        pc.equal(batch.column("role"), "user"),
        pc.equal(batch.column("turn_idx").cast(pa.int32()), 0)),
        pc.ends_with(batch.column("text"), "?")), False)
    sub = batch.filter(mask)
    return _table("first-turn-question", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()),
                  sub.column("text"), sub.num_rows)


def _entity_table(rule: str, sev: str, ev, n: int) -> pa.Table:
    """Conversation-less FINDINGS rows (entity-level rules)."""
    if isinstance(ev, pa.ChunkedArray):
        ev = ev.combine_chunks()
    return pa.Table.from_arrays(
        [pa.array([rule] * n, pa.string()),
         pa.array([sev] * n, pa.string()),
         pa.nulls(n, pa.string()),
         pa.nulls(n, pa.int32()),
         ev],
        schema=FINDINGS)


# ---------------------------------------------------------------------------
# Fused scan exchange: EVERY aggregation-shaped rule — 11 conversation-level
# counter rules, duplicate-turn-text, and the 7 entity/graph rule families —
# shares ONE tagged, hash-bucketed shuffle.  Per-batch partials pre-combine
# (bounding any hot key to n_blocks rows, the salted-tree-reduce skew
# guarantee), the single exchange co-locates each tag's key groups, and one
# shard function resolves every family with vectorized ``pa.Table.group_by``
# kernels.  Conversation-keyed tags ('c', 'd', 'chn') key on a=conv_id;
# entity tags key on the normalized entity (fam 'wa' buckets by person so
# the multi-employer roll-up is shard-local; 'cnt' spreads over (kind,
# norm) because kind alone is low-cardinality).  A Ray
# ``groupby().aggregate()`` with N aggregates costs ~N Python-level
# per-block passes plus per-exchange fixed latency; measured at sf0.1 the
# bucketed single-exchange shape is ~4x faster than the two-exchange
# version and ~6x faster than the original five-exchange one.
# ---------------------------------------------------------------------------

_SCAN_PART = pa.schema([
    ("tag", pa.string()), ("a", pa.string()), ("b", pa.string()),
    ("n", pa.int64()), ("f1", pa.int64()), ("f2", pa.int64()),
    ("n_turns", pa.int64()), ("n_tool", pa.int64()), ("n_q", pa.int64()),
    ("n_neg", pa.int64()), ("n_asst", pa.int64()), ("n_user", pa.int64()),
    ("n_quote", pa.int64()), ("n_acq", pa.int64()),
    ("t_max", pa.int32()), ("qu_max", pa.int32()),
    ("bucket", pa.int64()),
])

_SCAN_COUNTERS = ["n_turns", "n_tool", "n_q", "n_neg", "n_asst", "n_user",
                  "n_quote", "n_acq", "t_max", "qu_max"]

# deterministic per-tag salt (NOT Python hash(), which is
# process-randomized and would split one key across buckets)
_SCAN_SALT = {"c": 0, "d": 7, "wa": 1, "bug": 2, "acq": 3, "mgmt": 4,
              "cnt": 5, "chn": 6}


def _scan_rows(tag: str, a, b=None, n=None, f1=None, f2=None,
               counters: dict | None = None, *,
               spread: bool = False) -> pa.Table:
    """Assemble one tag's partial rows in the unified scan schema with
    their bucket column (hash of the tag's key + per-tag salt)."""
    import pandas as pd

    from ..functions.buckets import DEFAULT_GROUP_BUCKETS

    def arr(x):
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

    a = arr(a)
    k = len(a)
    cols = {"tag": pa.array([tag] * k, pa.string()), "a": a,
            "b": arr(b) if b is not None else pa.nulls(k, pa.string()),
            "n": arr(n) if n is not None else pa.nulls(k, pa.int64()),
            "f1": arr(f1) if f1 is not None else pa.nulls(k, pa.int64()),
            "f2": arr(f2) if f2 is not None else pa.nulls(k, pa.int64())}
    for name in _SCAN_COUNTERS:
        typ = pa.int32() if name in ("t_max", "qu_max") else pa.int64()
        cols[name] = (arr(counters[name]).cast(typ) if counters
                      else pa.nulls(k, typ))
    t = pa.table(cols)
    key = t.column("a").to_numpy(zero_copy_only=False)
    if spread:
        key = key + "\x1f" + t.column("b").to_numpy(zero_copy_only=False)
    h = (pd.util.hash_array(key) + _SCAN_SALT[tag]) % DEFAULT_GROUP_BUCKETS
    return t.append_column("bucket", pa.array(h.astype("int64"))) \
            .cast(_SCAN_PART)


def _conv_partial(t: pa.Table) -> pa.Table:
    """Transcript batch → tagged conversation-keyed partials: tag 'c'
    (the ten per-conversation counters, pre-combined in-batch) and tag
    'd' (per-(conv, text) duplicate counts — the text column ships once,
    as the duplicate-turn evidence)."""
    if t.num_columns == 0 or t.num_rows == 0:
        return _SCAN_PART.empty_table()
    is_tool = pc.cast(pc.fill_null(
        pc.equal(t.column("role"), "tool"), False), pa.int64())
    q_mask = pc.fill_null(pc.and_(
        pc.equal(t.column("role"), "user"),
        pc.ends_with(t.column("text"), "?")), False)
    is_q = pc.cast(q_mask, pa.int64())
    is_neg = pc.cast(pc.fill_null(pc.match_substring(
        t.column("text"), "no longer "), False), pa.int64())
    is_asst = pc.cast(pc.fill_null(
        pc.equal(t.column("role"), "assistant"), False), pa.int64())
    is_user = pc.cast(pc.fill_null(
        pc.equal(t.column("role"), "user"), False), pa.int64())
    is_quote = pc.cast(pc.fill_null(pc.match_substring(
        t.column("text"), ' said "'), False), pa.int64())
    is_acq = pc.cast(pc.fill_null(pc.match_substring_regex(
        t.column("text"), r"^[A-Z][A-Za-z ]+ acquired "), False),
        pa.int64())
    tidx = t.column("turn_idx").cast(pa.int32())
    qu_idx = pc.if_else(q_mask, tidx, pa.scalar(-1, pa.int32()))
    c = (pa.table({"conv_id": t.column("conv_id"),
                   "n_turns": pa.array([1] * t.num_rows, pa.int64()),
                   "n_tool": is_tool, "n_q": is_q, "n_neg": is_neg,
                   "n_asst": is_asst, "n_user": is_user,
                   "n_quote": is_quote, "n_acq": is_acq,
                   "t_max": tidx, "qu_max": qu_idx})
         .group_by("conv_id")
         .aggregate([(x, "sum") for x in _SCAN_COUNTERS[:8]]
                    + [("t_max", "max"), ("qu_max", "max")]))
    ctab = _scan_rows(
        "c", c.column("conv_id"),
        counters={"n_turns": c.column("n_turns_sum"),
                  "n_tool": c.column("n_tool_sum"),
                  "n_q": c.column("n_q_sum"),
                  "n_neg": c.column("n_neg_sum"),
                  "n_asst": c.column("n_asst_sum"),
                  "n_user": c.column("n_user_sum"),
                  "n_quote": c.column("n_quote_sum"),
                  "n_acq": c.column("n_acq_sum"),
                  "t_max": c.column("t_max_max"),
                  "qu_max": c.column("qu_max_max")})
    d = (t.select(["conv_id", "text"]).group_by(["conv_id", "text"])
         .aggregate([("text", "count")]))
    dtab = _scan_rows("d", d.column("conv_id"), b=d.column("text"),
                      n=d.column("text_count").cast(pa.int64()))
    return pa.concat_tables([ctab, dtab])


def _fam_partial(t: pa.Table) -> pa.Table:
    """Surface-triples batch → tagged entity/graph-rule partials
    (families wa/bug/acq/mgmt/cnt/chn; see the block comment above)."""
    from ..functions import rules as R
    from ..stages import link as L
    from ..stages.link import normalize_arrays

    if t.num_columns == 0 or t.num_rows == 0:
        return _SCAN_PART.empty_table()
    exact_kinds = pa.array(sorted(
        {"person", "tool", "module"} - R.FUZZY_KINDS - R.NONLINK_KINDS))
    zeros = lambda k: pa.array([0] * k, pa.int64())   # noqa: E731
    ones = lambda k: pa.array([1] * k, pa.int64())    # noqa: E731
    blank = lambda k: pa.array([""] * k, pa.string())  # noqa: E731
    parts = []

    wa = t.filter(pc.equal(t.column("pred"), "works_at"))
    if wa.num_rows:
        p = pa.table({
            "a": normalize_arrays(wa.column("subj_kind"), wa.column("subj")),
            "b": normalize_arrays(wa.column("obj_kind"), wa.column("obj")),
            "neg": pc.cast(wa.column("negated"), pa.int64()),
        }).group_by(["a", "b"]).aggregate([("neg", "max"), ("neg", "min")])
        # f1 = seen non-negated (min over negs == 0), f2 = seen negated
        parts.append(_scan_rows(
            "wa", p.column("a"), b=p.column("b"),
            f1=pc.cast(pc.equal(p.column("neg_min"), 0), pa.int64()),
            f2=p.column("neg_max")))

    bug = t.filter(pc.equal(t.column("pred"), "reported_bug"))
    if bug.num_rows:
        p = pa.table({
            "a": normalize_arrays(bug.column("obj_kind"), bug.column("obj")),
            "n": ones(bug.num_rows),
        }).group_by("a").aggregate([("n", "sum")])
        parts.append(_scan_rows("bug", p.column("a"), n=p.column("n_sum")))

    acq = t.filter(pc.equal(t.column("pred"), "acquired"))
    if acq.num_rows:
        sn = normalize_arrays(acq.column("subj_kind"), acq.column("subj"))
        on = normalize_arrays(acq.column("obj_kind"), acq.column("obj"))
        sn = sn.combine_chunks() if isinstance(sn, pa.ChunkedArray) else sn
        on = on.combine_chunks() if isinstance(on, pa.ChunkedArray) else on
        k = acq.num_rows
        p = pa.table({
            "a": pa.concat_arrays([sn, on]),
            "f1": pa.concat_arrays([ones(k), zeros(k)]),
            "f2": pa.concat_arrays([zeros(k), ones(k)]),
        }).group_by("a").aggregate([("f1", "max"), ("f2", "max")])
        parts.append(_scan_rows("acq", p.column("a"),
                                f1=p.column("f1_max"),
                                f2=p.column("f2_max")))

    mg = t.filter(pc.equal(t.column("pred"), "manages"))
    if mg.num_rows:
        s = normalize_arrays(mg.column("subj_kind"), mg.column("subj"))
        o = normalize_arrays(mg.column("obj_kind"), mg.column("obj"))
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        o = o.combine_chunks() if isinstance(o, pa.ChunkedArray) else o
        ne = pc.not_equal(s, o)
        s, o = s.filter(ne), o.filter(ne)
        if len(s):
            fwd = pc.less(s, o)
            p = pa.table({
                "a": pc.if_else(fwd, s, o), "b": pc.if_else(fwd, o, s),
                "f1": pc.cast(fwd, pa.int64()),
                "f2": pc.cast(pc.invert(fwd), pa.int64()),
            }).group_by(["a", "b"]).aggregate([("f1", "max"),
                                               ("f2", "max")])
            parts.append(_scan_rows("mgmt", p.column("a"), b=p.column("b"),
                                    f1=p.column("f1_max"),
                                    f2=p.column("f2_max")))

    men = L.mentions_from_triples(t)
    cnt = men.filter(pc.is_in(men.column("kind"), value_set=exact_kinds))
    if cnt.num_rows:
        p = (cnt.select(["kind", "norm"]).group_by(["kind", "norm"])
             .aggregate([("norm", "count")]))
        parts.append(_scan_rows(
            "cnt", p.column("kind"), b=p.column("norm"),
            n=p.column("norm_count").cast(pa.int64()), spread=True))

    if men.num_rows:
        p = pa.table({
            "a": men.column("conv_id"),
            "b": pc.binary_join_element_wise(
                men.column("kind").cast(pa.string()),
                men.column("norm").cast(pa.string()), ":"),
            "n": men.column("turn_idx").cast(pa.int64()),
        }).group_by(["a", "b", "n"]).aggregate([])
        parts.append(_scan_rows("chn", p.column("a"), b=p.column("b"),
                                n=p.column("n")))

    if not parts:
        return _SCAN_PART.empty_table()
    return pa.concat_tables(parts)


def _scan_shard_factory(eref):
    """Shard resolver over the fused exchange: dispatches every tag
    present in the bucket to its vectorized in-shard aggregation.
    ``eref`` (broadcast canonical-entity directory) is only consulted
    when 'cnt' rows are present."""
    import numpy as np

    def shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return FINDINGS.empty_table()
        g = g.drop_columns(["bucket"]).combine_chunks()
        outs = [FINDINGS.empty_table()]

        def sub(tag):
            s = g.filter(pc.equal(g.column("tag"), tag))
            return s if s.num_rows else None

        c = sub("c")
        if c is not None:
            agg = (c.select(["a"] + _SCAN_COUNTERS)
                   .group_by("a")
                   .aggregate([(x, "sum") for x in _SCAN_COUNTERS[:8]]
                              + [("t_max", "max"), ("qu_max", "max")]))
            # select by the GENERATED aggregate names, never positionally:
            # pyarrow has moved the key column's position between major
            # versions, and a positional rename would silently mislabel
            # every counter
            gen = ([f"{x}_sum" for x in _SCAN_COUNTERS[:8]]
                   + ["t_max_max", "qu_max_max"])
            agg = pa.table(
                {"conv_id": agg.column("a"),
                 **{name: agg.column(g)
                    for name, g in zip(_SCAN_COUNTERS, gen)}})
            outs.append(_conv_finish(agg))

        d = sub("d")
        if d is not None:
            dup = (d.select(["a", "b", "n"]).group_by(["a", "b"])
                   .aggregate([("n", "sum")]))
            hit = dup.filter(pc.greater(dup.column("n_sum"), 1))
            if hit.num_rows:
                outs.append(_table("duplicate-turn-text", "warning",
                                   hit.column("a"), None, hit.column("b"),
                                   hit.num_rows))

        wa = sub("wa")
        if wa is not None:
            p = (wa.select(["a", "b", "f1", "f2"]).group_by(["a", "b"])
                 .aggregate([("f1", "max"), ("f2", "max")]))
            both = p.filter(pc.and_(pc.equal(p.column("f1_max"), 1),
                                    pc.equal(p.column("f2_max"), 1)))
            outs.append(_entity_table(
                "work-contradiction", "warning",
                pc.binary_join_element_wise(
                    "person", both.column("a").cast(pa.string()),
                    "org", both.column("b").cast(pa.string()), ":"),
                both.num_rows))
            emp = p.select(["a"]).group_by("a").aggregate([("a", "count")])
            hot = emp.filter(pc.greater_equal(
                emp.column("a_count").cast(pa.int64()),
                MULTI_EMPLOYER_MIN))
            outs.append(_entity_table(
                "multi-employer", "warning",
                pc.binary_join_element_wise(
                    "person", hot.column("a").cast(pa.string()),
                    pc.cast(hot.column("a_count"), pa.string()), ":"),
                hot.num_rows))

        bug = sub("bug")
        if bug is not None:
            p = bug.select(["a", "n"]).group_by("a").aggregate([("n", "sum")])
            hs = p.filter(pc.greater_equal(p.column("n_sum"),
                                           MODULE_HOTSPOT_MIN))
            outs.append(_entity_table(
                "module-hotspot", "warning",
                pc.binary_join_element_wise(
                    "module", hs.column("a").cast(pa.string()),
                    pc.cast(hs.column("n_sum"), pa.string()), ":"),
                hs.num_rows))

        acq = sub("acq")
        if acq is not None:
            p = (acq.select(["a", "f1", "f2"]).group_by("a")
                 .aggregate([("f1", "max"), ("f2", "max")]))
            both = p.filter(pc.and_(pc.equal(p.column("f1_max"), 1),
                                    pc.equal(p.column("f2_max"), 1)))
            outs.append(_entity_table(
                "acquirer-acquired", "info",
                pc.binary_join_element_wise(
                    "org", both.column("a").cast(pa.string()), ":"),
                both.num_rows))

        mg = sub("mgmt")
        if mg is not None:
            p = (mg.select(["a", "b", "f1", "f2"]).group_by(["a", "b"])
                 .aggregate([("f1", "max"), ("f2", "max")]))
            both = p.filter(pc.and_(pc.equal(p.column("f1_max"), 1),
                                    pc.equal(p.column("f2_max"), 1)))
            outs.append(_entity_table(
                "bidirectional-management", "warning",
                pc.binary_join_element_wise(
                    "person", both.column("a").cast(pa.string()),
                    "person", both.column("b").cast(pa.string()), ":"),
                both.num_rows))

        cnt = sub("cnt")
        if cnt is not None:
            p = (cnt.select(["a", "b", "n"]).group_by(["a", "b"])
                 .aggregate([("n", "sum")])
                 .rename_columns(["kind", "norm", "n"]))
            ents = ray.get(eref)
            joined = p.join(ents.select(["kind", "norm", "canonical"]),
                            keys=["kind", "norm"], join_type="inner")
            for rule, hit in (
                ("hot-entity", joined.filter(pc.greater_equal(
                    joined.column("n"), HOT_ENTITY_MIN))),
                ("lonely-entity", joined.filter(pc.less_equal(
                    joined.column("n"), LONELY_ENTITY_MAX))),
            ):
                ev = pc.binary_join_element_wise(
                    hit.column("kind").cast(pa.string()),
                    hit.column("canonical").cast(pa.string()),
                    pc.cast(hit.column("n"), pa.string()), ":")
                outs.append(_entity_table(rule, "info", ev, hit.num_rows))

        chn = sub("chn")
        if chn is not None:
            p = (chn.select(["a", "b", "n"]).group_by(["a", "b", "n"])
                 .aggregate([]).sort_by([("a", "ascending"),
                                         ("b", "ascending"),
                                         ("n", "ascending")]))
            av = p.column("a").to_numpy(zero_copy_only=False)
            bv = p.column("b").to_numpy(zero_copy_only=False)
            nv = p.column("n").to_numpy(zero_copy_only=False)
            if len(av) > 1:
                consec = ((av[:-1] == av[1:]) & (bv[:-1] == bv[1:])
                          & (nv[1:] == nv[:-1] + 1))
                idx = np.nonzero(consec)[0]
            else:
                idx = np.array([], dtype=np.int64)
            k = len(idx)
            ev = pc.binary_join_element_wise(
                pa.array(bv[idx], pa.string()),
                pc.cast(pa.array(nv[idx], pa.int64()), pa.string()), ":")
            outs.append(pa.Table.from_arrays(
                [pa.array(["rapid-re-mention"] * k, pa.string()),
                 pa.array(["info"] * k, pa.string()),
                 pa.array(av[idx], pa.string()),
                 pa.nulls(k, pa.int32()), ev],
                schema=FINDINGS))

        return pa.concat_tables(outs)

    return shard


def _conv_finish(t: pa.Table) -> pa.Table:
    """Per-conversation counters (globally aggregated) -> the 11
    conversation-level threshold rules."""
    outs = []

    def emit(rule, sev, sub, ev_col):
        outs.append(_table(rule, sev, sub.column("conv_id"), None,
                           pc.cast(sub.column(ev_col), pa.string()),
                           sub.num_rows))

    emit("repeat-caller", "info",
         t.filter(pc.greater_equal(t.column("n_tool"),
                                   REPEAT_CALLER_MIN)), "n_tool")
    emit("long-conversation", "info",
         t.filter(pc.greater_equal(t.column("n_turns"),
                                   LONG_CONV_TURNS)), "n_turns")
    emit("no-tool-conversation", "info",
         t.filter(pc.equal(t.column("n_tool"), 0)), "n_turns")
    emit("question-heavy", "info",
         t.filter(pc.greater_equal(t.column("n_q"),
                                   QUESTION_HEAVY_MIN)), "n_q")
    emit("short-conversation", "info",
         t.filter(pc.less_equal(t.column("n_turns"),
                                SHORT_CONV_TURNS)), "n_turns")
    emit("negation-heavy", "warning",
         t.filter(pc.greater_equal(t.column("n_neg"),
                                   NEGATION_HEAVY_MIN)), "n_neg")
    emit("tool-heavy", "info",
         t.filter(pc.and_(
             pc.greater_equal(t.column("n_tool"), 1),
             pc.greater_equal(
                 pc.multiply(t.column("n_tool"),
                             pa.scalar(TOOL_HEAVY_FACTOR, pa.int64())),
                 t.column("n_turns")))), "n_tool")
    emit("ends-with-question", "info",
         t.filter(pc.equal(t.column("qu_max").cast(pa.int32()),
                           t.column("t_max").cast(pa.int32()))),
         "t_max")
    emit("assistant-heavy", "info",
         t.filter(pc.greater(t.column("n_asst"), t.column("n_user"))),
         "n_asst")
    emit("quote-heavy", "info",
         t.filter(pc.greater_equal(t.column("n_quote"),
                                   QUOTE_HEAVY_MIN)), "n_quote")
    emit("acquisition-conversation", "info",
         t.filter(pc.greater_equal(t.column("n_acq"), 1)), "n_acq")
    return pa.concat_tables(outs)


def _conv_scan_rules(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Conversation-keyed rules standalone (one bucketed exchange); the
    full ``findings`` battery fuses these partials with the entity-family
    partials into a single shared exchange instead."""
    return (ds.map_batches(_conv_partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(_scan_shard_factory(None),
                                          batch_format="pyarrow"))


def _entity_setup(sf_dir: str, triples, entities):
    """Shared triples/entities/eref wiring for the entity-family rules."""
    from ..stages import extract as X
    from ..stages import link as L
    from ..stages.materialize import entity_lookup_ref

    if triples is None:
        tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
        triples = X.extract_triples(tds).materialize()
    if entities is None:
        mentions = triples.map_batches(L.mentions_from_triples,
                                       batch_format="pyarrow")
        entities = L.build_entities(
            L.vocab_from_mentions(mentions)).materialize()
    return triples, entity_lookup_ref(entities)


def entity_rules(sf_dir: str, *, triples: "ray.data.Dataset | None" = None,
                 entities: "ray.data.Dataset | None" = None
                 ) -> "ray.data.Dataset":
    """Entity-/graph-level rules standalone (one bucketed exchange off one
    triples materialization):

    - hot-entity / lonely-entity: mention-count extremes ('cnt').
    - multi-employer: >= MULTI_EMPLOYER_MIN distinct works_at objects.
    - work-contradiction: (person, org) asserted negated AND non-negated.
    - module-hotspot: >= MODULE_HOTSPOT_MIN bug reports ('bug').
    - acquirer-acquired: org on both sides of 'acquired' ('acq').
    - bidirectional-management: manages in both directions ('mgmt').
    - rapid-re-mention: consecutive-turn mention chains ('chn').

    Turn text never enters the exchange; see the fused-exchange block
    comment for the partitioning/skew contract."""
    triples, eref = _entity_setup(sf_dir, triples, entities)
    return (triples.map_batches(_fam_partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(_scan_shard_factory(eref),
                                          batch_format="pyarrow"))


def _per_turn_scan(transcripts_ds: "ray.data.Dataset",
                   extra_rules: list | None = None) -> "ray.data.Dataset":
    """The 30 per-turn predicate rules fused into ONE map over the
    transcript stream (plus any config-loaded rules)."""
    builtin = [_rule_large_tool_result, _rule_long_turn, _rule_acquisition,
               _rule_question_turn, _rule_negated_fact, _rule_empty_turn,
               _rule_meeting, _rule_small_tool_result, _rule_bug_report,
               _rule_terse_turn, _rule_assistant_long_answer,
               _rule_assistant_question, _rule_pronoun_turn,
               _rule_tool_announce, _rule_numeric_turn,
               _rule_clarification, _rule_deferred_followup,
               _rule_quoted_claim, _rule_coordinated_subjects,
               _rule_appositive_role, _rule_org_departure, _rule_org_join,
               _rule_org_partnership, _rule_management_edge,
               _rule_relative_clause, _rule_maintainer_claim,
               _rule_daily_usage, _rule_dotted_module,
               _rule_negated_question, _rule_first_turn_question]
    rules = builtin + list(extra_rules or [])
    return transcripts_ds.map_batches(
        lambda t: pa.concat_tables([r(t) for r in rules]),
        batch_format="pyarrow", zero_copy_batch=True)


def scan(transcripts_ds: "ray.data.Dataset",
         extra_rules: list | None = None) -> "ray.data.Dataset":
    """Run every transcript-level rule; findings = union of per-rule
    outputs (ScanPass).  Per-turn rules fuse into ONE map over the
    stream; conversation-level rules share one bucketed exchange.

    extra_rules: externally-loaded per-batch rule functions
    (state.config.config_findings_rules — the querydb-plugin surface),
    fused into the same single pass."""
    return _per_turn_scan(transcripts_ds, extra_rules) \
        .union(_conv_scan_rules(transcripts_ds))


def findings(sf_dir: str, *, graph: dict | None = None):
    """Full battery (50 rules: 30 per-turn + 12 conversation-level +
    8 entity/graph): matches the reference's 50-query scan battery
    rule-for-rule in count
    (``querydb/src/main/scala/io/joern/scanners/**``, 50 Query.make
    sites).

    The whole battery costs ONE map over the transcript stream (per-turn
    rules) plus ONE tagged bucketed exchange: the conversation-keyed
    partials (from transcripts) and the entity-family partials (from
    triples) share the unified scan schema, union before the shuffle,
    and resolve in the same shard pass.

    graph: an optional ``kg.build_graph`` result dict — when supplied,
    the entity/graph rules reuse its materialized triples/entities
    (the ScanPass-over-an-already-built-CPG shape) instead of
    re-extracting."""
    g = graph or {}
    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    triples, eref = _entity_setup(sf_dir, g.get("triples_surface"),
                                  g.get("entities"))
    fused = (tds.map_batches(_conv_partial, batch_format="pyarrow")
             .union(triples.map_batches(_fam_partial,
                                        batch_format="pyarrow"))
             .groupby("bucket").map_groups(_scan_shard_factory(eref),
                                           batch_format="pyarrow"))
    return _per_turn_scan(tds).union(fused)


def findings_sql(transcripts_rel: str) -> str:
    from ..extract import sqlgen as G
    from ..stages import chains as CH

    tr = transcripts_rel
    ws = "' ' || chr(9) || chr(10) || chr(12) || chr(13)"
    ntok = (f"CASE WHEN trim(text, {ws}) = '' THEN 0 "
            f"ELSE len(regexp_split_to_array(trim(text, {ws}), '\\s+')) END")
    ne = G._norm_expr
    return f"""
    WITH resolved AS ({G.resolved_triples_sql(tr)}),
    conv_agg AS (
      SELECT conv_id, count(*) AS n_turns,
             CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_tool,
             CAST(sum(CASE WHEN role = 'user' AND ends_with(text, '?')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_q,
             CAST(sum(CASE WHEN contains(text, 'no longer ')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
             CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_asst,
             CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_user,
             CAST(sum(CASE WHEN contains(text, ' said "') THEN 1 ELSE 0
                      END) AS BIGINT) AS n_quote,
             CAST(sum(CASE WHEN regexp_matches(text,
                      '^[A-Z][A-Za-z ]+ acquired ') THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_acq,
             max(turn_idx) AS t_max,
             max(CASE WHEN role = 'user' AND ends_with(text, '?')
                 THEN turn_idx ELSE -1 END) AS qu_max
      FROM {tr} GROUP BY conv_id),
    works_at AS (
      SELECT DISTINCT {ne('subj', 'subj_kind')} AS s,
             {ne('obj', 'obj_kind')} AS o, negated
      FROM resolved WHERE pred = 'works_at')
    SELECT 'large-tool-result' AS rule, 'warning' AS severity, conv_id,
           turn_idx, tool AS evidence
    FROM {tr}
    WHERE role = 'tool'
      AND regexp_matches(text, '^result: ok \\(([0-9]+) items\\)$')
      AND CAST(regexp_extract(text, '^result: ok \\(([0-9]+) items\\)$', 1)
               AS BIGINT) > {LARGE_RESULT_MIN}
    UNION ALL
    SELECT 'small-tool-result', 'info', conv_id, turn_idx, tool
    FROM {tr}
    WHERE role = 'tool'
      AND regexp_matches(text, '^result: ok \\(([0-9]+) items\\)$')
      AND CAST(regexp_extract(text, '^result: ok \\(([0-9]+) items\\)$', 1)
               AS BIGINT) < {SMALL_RESULT_MAX}
    UNION ALL
    SELECT 'long-turn', 'info', conv_id, turn_idx, CAST({ntok} AS VARCHAR)
    FROM {tr} WHERE {ntok} > {LONG_TURN_TOKENS}
    UNION ALL
    SELECT 'terse-turn', 'info', conv_id, turn_idx, CAST({ntok} AS VARCHAR)
    FROM {tr} WHERE {ntok} BETWEEN 1 AND {TERSE_TURN_TOKENS}
    UNION ALL
    SELECT 'assistant-long-answer', 'info', conv_id, turn_idx,
           CAST({ntok} AS VARCHAR)
    FROM {tr}
    WHERE role = 'assistant' AND {ntok} > {ASSISTANT_LONG_TOKENS}
    UNION ALL
    SELECT 'assistant-question', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE role = 'assistant' AND ends_with(text, '?')
    UNION ALL
    SELECT 'pronoun-turn', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE regexp_matches(text, '^(She|He|Her|His) ')
    UNION ALL
    SELECT 'tool-announce', 'info', conv_id, turn_idx,
           regexp_extract(text, '^Calling ([a-z0-9_]+) now\\.$', 1)
    FROM {tr} WHERE regexp_matches(text, '^Calling ([a-z0-9_]+) now\\.$')
    UNION ALL
    SELECT 'numeric-turn', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE regexp_matches(text, '[0-9]')
    UNION ALL
    SELECT 'clarification-request', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE contains(text, 'clarify')
    UNION ALL
    SELECT 'deferred-followup', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE contains(text, 'follow up with more details')
    UNION ALL
    SELECT 'org-acquisition', 'info', conv_id, turn_idx, text
    FROM {tr}
    WHERE regexp_matches(text, '^[A-Z][A-Za-z ]+ acquired ')
    UNION ALL
    SELECT 'question-turn', 'info', conv_id, turn_idx, text
    FROM {tr}
    WHERE role = 'user' AND ends_with(text, '?')
    UNION ALL
    SELECT 'negated-fact', 'warning', conv_id, turn_idx, text
    FROM {tr} WHERE contains(text, 'no longer ')
    UNION ALL
    SELECT 'empty-turn', 'warning', conv_id, turn_idx, role
    FROM {tr} WHERE trim(text, {ws}) = ''
    UNION ALL
    SELECT 'quoted-claim', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE contains(text, ' said "')
    UNION ALL
    SELECT 'coordinated-subjects', 'info', conv_id, turn_idx, text
    FROM {tr}
    WHERE regexp_matches(text, '(^| )[A-Z][a-z]+ and [A-Z][a-z]+ (work at|use) ')
    UNION ALL
    SELECT 'appositive-role', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE contains(text, ', the maintainer of ')
    UNION ALL
    SELECT 'org-departure', 'warning', conv_id, turn_idx, text
    FROM {tr} WHERE regexp_matches(text, '(^| )[A-Z][a-z]+ left [A-Z]')
    UNION ALL
    SELECT 'org-join', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE regexp_matches(text, '(^| )[A-Z][a-z]+ joined [A-Z]')
    UNION ALL
    SELECT 'org-partnership', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE contains(text, ' partnered with ')
    UNION ALL
    SELECT 'management-edge', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE regexp_matches(text, '(^| )[A-Z][a-z]+ manages [A-Z]')
    UNION ALL
    SELECT 'relative-clause', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE contains(text, ', who manages ')
    UNION ALL
    SELECT 'maintainer-claim', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE regexp_matches(text, '(^| )[A-Z][a-z]+ maintains ')
    UNION ALL
    SELECT 'daily-usage', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE contains(text, ' daily')
    UNION ALL
    SELECT 'dotted-module-mention', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE regexp_matches(text, '[a-z_]+\\.[a-z_]+')
    UNION ALL
    SELECT 'negated-question', 'warning', conv_id, turn_idx, text
    FROM {tr}
    WHERE contains(text, 'no longer ') AND ends_with(text, '?')
    UNION ALL
    SELECT 'first-turn-question', 'info', conv_id, turn_idx, text
    FROM {tr}
    WHERE role = 'user' AND turn_idx = 0 AND ends_with(text, '?')
    UNION ALL
    SELECT 'person-meeting', 'info', conv_id, turn_idx, text
    FROM {tr} WHERE contains(text, ' met with ')
    UNION ALL
    SELECT 'bug-report', 'warning', conv_id, turn_idx,
           regexp_extract(text,
             ' reported a bug in ([a-z_]+(\\.[a-z_]+)*)[.?]$', 1)
    FROM {tr}
    WHERE regexp_matches(text,
            ' reported a bug in ([a-z_]+(\\.[a-z_]+)*)[.?]$')
    UNION ALL
    SELECT 'repeat-caller', 'info', conv_id, NULL, CAST(n_tool AS VARCHAR)
    FROM conv_agg WHERE n_tool >= {REPEAT_CALLER_MIN}
    UNION ALL
    SELECT 'long-conversation', 'info', conv_id, NULL,
           CAST(n_turns AS VARCHAR)
    FROM conv_agg WHERE n_turns >= {LONG_CONV_TURNS}
    UNION ALL
    SELECT 'no-tool-conversation', 'info', conv_id, NULL,
           CAST(n_turns AS VARCHAR)
    FROM conv_agg WHERE n_tool = 0
    UNION ALL
    SELECT 'question-heavy', 'info', conv_id, NULL, CAST(n_q AS VARCHAR)
    FROM conv_agg WHERE n_q >= {QUESTION_HEAVY_MIN}
    UNION ALL
    SELECT 'short-conversation', 'info', conv_id, NULL,
           CAST(n_turns AS VARCHAR)
    FROM conv_agg WHERE n_turns <= {SHORT_CONV_TURNS}
    UNION ALL
    SELECT 'negation-heavy', 'warning', conv_id, NULL,
           CAST(n_neg AS VARCHAR)
    FROM conv_agg WHERE n_neg >= {NEGATION_HEAVY_MIN}
    UNION ALL
    SELECT 'tool-heavy', 'info', conv_id, NULL, CAST(n_tool AS VARCHAR)
    FROM conv_agg
    WHERE n_tool >= 1 AND {TOOL_HEAVY_FACTOR} * n_tool >= n_turns
    UNION ALL
    SELECT 'ends-with-question', 'info', conv_id, NULL,
           CAST(t_max AS VARCHAR)
    FROM conv_agg WHERE qu_max = t_max
    UNION ALL
    SELECT 'assistant-heavy', 'info', conv_id, NULL,
           CAST(n_asst AS VARCHAR)
    FROM conv_agg WHERE n_asst > n_user
    UNION ALL
    SELECT 'quote-heavy', 'info', conv_id, NULL, CAST(n_quote AS VARCHAR)
    FROM conv_agg WHERE n_quote >= {QUOTE_HEAVY_MIN}
    UNION ALL
    SELECT 'acquisition-conversation', 'info', conv_id, NULL,
           CAST(n_acq AS VARCHAR)
    FROM conv_agg WHERE n_acq >= 1
    UNION ALL
    SELECT 'duplicate-turn-text', 'warning', conv_id, NULL, text
    FROM {tr} GROUP BY conv_id, text HAVING count(*) > 1
    UNION ALL
    SELECT 'hot-entity', 'info', NULL, NULL,
           kind || ':' || norm || ':' || CAST(n AS VARCHAR)
    FROM (
      SELECT kind, norm, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT subj_kind AS kind,
               {ne('subj', 'subj_kind')} AS norm FROM resolved
        UNION ALL
        SELECT obj_kind, {ne('obj', 'obj_kind')} FROM resolved)
      WHERE kind IN ('person', 'tool', 'module')
      GROUP BY kind, norm)
    WHERE n >= {HOT_ENTITY_MIN}
    UNION ALL
    SELECT 'lonely-entity', 'info', NULL, NULL,
           kind || ':' || norm || ':' || CAST(n AS VARCHAR)
    FROM (
      SELECT kind, norm, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT subj_kind AS kind,
               {ne('subj', 'subj_kind')} AS norm FROM resolved
        UNION ALL
        SELECT obj_kind, {ne('obj', 'obj_kind')} FROM resolved)
      WHERE kind IN ('person', 'tool', 'module')
      GROUP BY kind, norm)
    WHERE n <= {LONELY_ENTITY_MAX}
    UNION ALL
    SELECT 'multi-employer', 'warning', NULL, NULL,
           'person:' || s || ':' || CAST(n AS VARCHAR)
    FROM (SELECT s, CAST(count(DISTINCT o) AS BIGINT) AS n
          FROM works_at GROUP BY s)
    WHERE n >= {MULTI_EMPLOYER_MIN}
    UNION ALL
    SELECT 'work-contradiction', 'warning', NULL, NULL,
           'person:' || s || ':org:' || o
    FROM (SELECT s, o, count(*) AS c FROM works_at GROUP BY s, o)
    WHERE c = 2
    UNION ALL
    SELECT 'module-hotspot', 'warning', NULL, NULL,
           'module:' || m || ':' || CAST(n AS VARCHAR)
    FROM (SELECT {ne('obj', 'obj_kind')} AS m,
                 CAST(count(*) AS BIGINT) AS n
          FROM resolved WHERE pred = 'reported_bug' GROUP BY 1)
    WHERE n >= {MODULE_HOTSPOT_MIN}
    UNION ALL
    SELECT 'acquirer-acquired', 'info', NULL, NULL, 'org:' || x
    FROM (SELECT {ne('subj', 'subj_kind')} AS x FROM resolved
          WHERE pred = 'acquired'
          INTERSECT
          SELECT {ne('obj', 'obj_kind')} FROM resolved
          WHERE pred = 'acquired')
    UNION ALL
    SELECT 'bidirectional-management', 'warning', NULL, NULL,
           'person:' || a || ':person:' || b
    FROM (
      SELECT least(s, o) AS a, greatest(s, o) AS b,
             max(CASE WHEN s < o THEN 1 ELSE 0 END) AS f,
             max(CASE WHEN s > o THEN 1 ELSE 0 END) AS r
      FROM (SELECT DISTINCT {ne('subj', 'subj_kind')} AS s,
                   {ne('obj', 'obj_kind')} AS o
            FROM resolved WHERE pred = 'manages')
      WHERE s <> o GROUP BY 1, 2)
    WHERE f = 1 AND r = 1
    UNION ALL
    SELECT 'rapid-re-mention', 'info', conv_id, NULL,
           kind || ':' || norm || ':' || CAST(from_turn AS VARCHAR)
    FROM ({CH.mention_chains_sql(tr)})
    WHERE to_turn = from_turn + 1
    """


# ---------------------------------------------------------------------------
# snippet retrieval (CodeDumper analog)
# ---------------------------------------------------------------------------

_SNIPPET_UNION = pa.schema([
    ("conv_id", pa.string()),
    ("want_turn", pa.int32()),       # join key (anchor±context / turn_idx)
    ("anchor_turn_idx", pa.int32()),  # valid ⇒ anchor-key row
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
])

_SNIPPET_OUT = pa.schema([
    ("conv_id", pa.string()),
    ("anchor_turn_idx", pa.int32()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
])


def snippets(sf_dir: str, *, context: int = 1, n_buckets: int = 256):
    """Per finding with a turn anchor: surrounding turns' verbatim text.

    Fully distributed (findings scale WITH the corpus, so no driver-side
    anchor set): anchors flat-map to their ±context (conv_id, want_turn)
    keys, then both sides co-locate by hash(conv_id) bucket and each bucket
    runs one vectorized Acero inner join.  A conversation lands wholly in
    one bucket, so the per-bucket key dedup equals a global DISTINCT.  The
    turn text is shuffled once, narrow (4 columns) — inherent to snippet
    retrieval, whose output IS text next to anchors."""
    import pandas as pd

    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    f = scan(tds)

    def _bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(t.column("conv_id").to_numpy(
            zero_copy_only=False))
        return t.append_column(
            "bucket", pa.array((h % n_buckets).astype("int64")))

    def anchor_keys(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_valid(t.column("turn_idx")))
        parts = []
        anchor = sub.column("turn_idx").cast(pa.int32())
        for d in range(-context, context + 1):
            parts.append(pa.table({
                "conv_id": sub.column("conv_id"),
                "want_turn": pc.add(anchor, d).cast(pa.int32()),
                "anchor_turn_idx": anchor,
            }))
        keys = (pa.concat_tables(parts)
                .group_by(["conv_id", "want_turn", "anchor_turn_idx"])
                .aggregate([]))  # local distinct (combiner)
        n = keys.num_rows
        keys = pa.Table.from_arrays(
            [keys.column("conv_id"), keys.column("want_turn"),
             keys.column("anchor_turn_idx"), pa.nulls(n, pa.int32()),
             pa.nulls(n, pa.string()), pa.nulls(n, pa.string())],
            schema=_SNIPPET_UNION)
        return _bucket(keys)

    def turn_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        tab = pa.Table.from_arrays(
            [t.column("conv_id").cast(pa.string()),
             t.column("turn_idx").cast(pa.int32()),
             pa.nulls(n, pa.int32()),
             t.column("turn_idx").cast(pa.int32()),
             t.column("role").cast(pa.string()),
             t.column("text").cast(pa.string())],
            schema=_SNIPPET_UNION)
        return _bucket(tab)

    def join_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["bucket"])
        is_key = pc.is_valid(g.column("anchor_turn_idx"))
        keys = (g.filter(is_key)
                .select(["conv_id", "want_turn", "anchor_turn_idx"])
                .group_by(["conv_id", "want_turn", "anchor_turn_idx"])
                .aggregate([]))  # global distinct within the conv's bucket
        turns = g.filter(pc.invert(is_key)) \
                 .select(["conv_id", "want_turn", "turn_idx", "role", "text"])
        if keys.num_rows == 0 or turns.num_rows == 0:
            return _SNIPPET_OUT.empty_table()
        joined = turns.join(keys, keys=["conv_id", "want_turn"],
                            join_type="inner")
        return S_cast(joined)

    def S_cast(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("conv_id").cast(pa.string()),
             t.column("anchor_turn_idx").cast(pa.int32()),
             t.column("turn_idx").cast(pa.int32()),
             t.column("role").cast(pa.string()),
             t.column("text").cast(pa.string())],
            schema=_SNIPPET_OUT)

    tagged = (f.map_batches(anchor_keys, batch_format="pyarrow")
              .union(tds.map_batches(turn_rows, batch_format="pyarrow")))
    return tagged.groupby("bucket").map_groups(
        join_bucket, batch_format="pyarrow")


def snippets_sql(transcripts_rel: str, *, context: int = 1) -> str:
    return f"""
    WITH f AS ({findings_sql(transcripts_rel)})
    SELECT t.conv_id, f.turn_idx AS anchor_turn_idx, t.turn_idx, t.role,
           t.text
    FROM (SELECT DISTINCT conv_id, turn_idx FROM f
          WHERE turn_idx IS NOT NULL) f
    JOIN {transcripts_rel} t
      ON t.conv_id = f.conv_id
     AND t.turn_idx BETWEEN f.turn_idx - {context} AND f.turn_idx + {context}
    """


# ---------------------------------------------------------------------------
# entity mention counts (scan-report / NamespaceCreator-style aggregation)
# ---------------------------------------------------------------------------

def conv_tools(sf_dir: str, *, n_buckets: int = 1024):
    """conv_id → sorted distinct tools invoked, comma-joined — the
    multi-valued-property aggregation (``linkToMultiple`` /
    ``inheritsFromTypeFullName`` list-column analog, flattened to a string
    so the DuckDB oracle compares exactly).  Two-phase: per-batch distinct
    pairs, then conversation-bucket groupby with a vectorized pandas
    string-agg (buckets, not per-conv groups — same partitioning contract
    as pronoun resolution)."""
    import pandas as pd

    ds = ray.data.read_parquet(synth.transcripts_path(sf_dir),
                               columns=["conv_id", "role", "tool"])

    def pairs(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.and_(pc.equal(t.column("role"), "tool"),
                                    pc.is_valid(t.column("tool"))), False)
        sub = t.filter(mask).select(["conv_id", "tool"])
        sub = sub.group_by(["conv_id", "tool"]).aggregate([])
        h = pd.util.hash_array(sub.column("conv_id").to_numpy(
            zero_copy_only=False))
        return sub.append_column(
            "bucket", pa.array((h % n_buckets).astype("int64")))

    def agg(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.schema([("conv_id", pa.string()),
                              ("tools", pa.string())]).empty_table()
        df = group.to_pandas().drop_duplicates(["conv_id", "tool"])
        df = df.sort_values(["conv_id", "tool"], kind="mergesort")
        out = df.groupby("conv_id", sort=True)["tool"] \
                .agg(",".join).reset_index()
        return pa.table({"conv_id": pa.array(out["conv_id"], pa.string()),
                         "tools": pa.array(out["tool"], pa.string())})

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("bucket").map_groups(agg, batch_format="pyarrow"))


def conv_tools_sql(transcripts_rel: str) -> str:
    return f"""
    SELECT conv_id, string_agg(tool, ',' ORDER BY tool) AS tools
    FROM (SELECT DISTINCT conv_id, tool FROM {transcripts_rel}
          WHERE role = 'tool' AND tool IS NOT NULL)
    GROUP BY conv_id
    """


def entity_mention_counts(sf_dir: str, *, n_salts: int | None = None):
    """(kind, norm) → mention count over both triple slots via the shared
    skew-safe counter (per-batch partials always; pass ``n_salts`` to
    tree-reduce Zipf-head keys across salts when block counts are huge —
    identical results by sum associativity, equivalence pytest-asserted
    over a planted million-row hot key)."""
    from ..functions.skew import salted_multikey_count
    from ..stages import extract as X
    from ..stages.link import mentions_from_triples

    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    mentions = X.extract_triples(tds).map_batches(
        mentions_from_triples, batch_format="pyarrow")
    return salted_multikey_count(mentions, ["kind", "norm"], "n_mentions",
                                 n_salts=n_salts)
