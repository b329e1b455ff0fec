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
from ray.data.aggregate import Count, Sum

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
LARGE_RESULT_MIN = 90
SMALL_RESULT_MAX = 5
LONG_TURN_TOKENS = 12
REPEAT_CALLER_MIN = 4
LONG_CONV_TURNS = 23
QUESTION_HEAVY_MIN = 2
HOT_ENTITY_MIN = 200


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
    trimmed = ascii_trim(batch.column("text"))
    n_tokens = pc.if_else(pc.equal(trimmed, ""), 0,
                          pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1))
    mask = pc.greater(n_tokens, LONG_TURN_TOKENS)
    sub = batch.filter(mask)
    ev = pc.cast(pc.if_else(pc.equal(ascii_trim(sub.column("text")), ""),
                 0, pc.add(pc.count_substring_regex(
                     ascii_trim(sub.column("text")), r"\s+"), 1)),
                 pa.string())
    return _table("long-turn", "info", sub.column("conv_id"),
                  sub.column("turn_idx").cast(pa.int32()), ev, sub.num_rows)


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


def _repeat_caller(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Conversation-level rule: > REPEAT_CALLER_MIN-1 tool invocations.
    Two-phase count (per-batch partial, then small groupby sum)."""
    def partial(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.fill_null(pc.equal(t.column("role"), "tool"), False))
        return (sub.select(["conv_id"]).group_by("conv_id")
                .aggregate([("conv_id", "count")])
                .rename_columns(["conv_id", "n"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("conv_id").aggregate(Sum(on="n", alias_name="n_calls")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return FINDINGS.empty_table()
        sub = t.filter(pc.greater_equal(t.column("n_calls"),
                                        REPEAT_CALLER_MIN))
        return _table("repeat-caller", "info", sub.column("conv_id"),
                      None, pc.cast(sub.column("n_calls"), pa.string()),
                      sub.num_rows)
    return agg.map_batches(finish, batch_format="pyarrow")


def _conv_level_rules(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """All conversation-level rules off ONE two-phase aggregation pass:
    per-batch partial counters (total turns / tool turns / question turns),
    one global groupby, then per-rule thresholds — N rules, one shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        is_tool = pc.cast(pc.fill_null(
            pc.equal(t.column("role"), "tool"), False), pa.int64())
        is_q = pc.cast(pc.fill_null(pc.and_(
            pc.equal(t.column("role"), "user"),
            pc.ends_with(t.column("text"), "?")), False), pa.int64())
        return (pa.table({"conv_id": t.column("conv_id"),
                          "n_turns": pa.array([1] * t.num_rows, pa.int64()),
                          "n_tool": is_tool, "n_q": is_q})
                .group_by("conv_id")
                .aggregate([("n_turns", "sum"), ("n_tool", "sum"),
                            ("n_q", "sum")])
                .rename_columns(["conv_id", "n_turns", "n_tool", "n_q"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("conv_id")
           .aggregate(Sum(on="n_turns", alias_name="n_turns"),
                      Sum(on="n_tool", alias_name="n_tool"),
                      Sum(on="n_q", alias_name="n_q")))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return FINDINGS.empty_table()
        outs = []
        rc = t.filter(pc.greater_equal(t.column("n_tool"),
                                       REPEAT_CALLER_MIN))
        outs.append(_table("repeat-caller", "info", rc.column("conv_id"),
                           None, pc.cast(rc.column("n_tool"), pa.string()),
                           rc.num_rows))
        lc = t.filter(pc.greater_equal(t.column("n_turns"), LONG_CONV_TURNS))
        outs.append(_table("long-conversation", "info", lc.column("conv_id"),
                           None, pc.cast(lc.column("n_turns"), pa.string()),
                           lc.num_rows))
        nt = t.filter(pc.equal(t.column("n_tool"), 0))
        outs.append(_table("no-tool-conversation", "info",
                           nt.column("conv_id"), None,
                           pc.cast(nt.column("n_turns"), pa.string()),
                           nt.num_rows))
        qh = t.filter(pc.greater_equal(t.column("n_q"), QUESTION_HEAVY_MIN))
        outs.append(_table("question-heavy", "info", qh.column("conv_id"),
                           None, pc.cast(qh.column("n_q"), pa.string()),
                           qh.num_rows))
        return pa.concat_tables(outs)
    return agg.map_batches(finish, batch_format="pyarrow")


def hot_entity_rule(sf_dir: str) -> "ray.data.Dataset":
    """Entity-level rule over the CANONICAL entity table: canonical
    entities (exact-key kinds, so the DuckDB oracle is expressible) whose
    total mention count across both triple slots ≥ HOT_ENTITY_MIN.
    Counts are two-phase; the canonicalization join is a broadcast of the
    vocabulary-sized directory."""
    from ..functions import rules as R
    from ..stages import extract as X
    from ..stages import link as L

    from ..functions.skew import salted_multikey_count

    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    triples = X.extract_triples(tds)
    mentions = triples.map_batches(L.mentions_from_triples,
                                   batch_format="pyarrow").materialize()
    counts = salted_multikey_count(mentions, ["kind", "norm"], "n")

    entities = L.build_entities(
        L.vocab_from_mentions(mentions)).materialize()
    from ..stages.materialize import entity_lookup_ref
    eref = entity_lookup_ref(entities)
    exact_kinds = pa.array(sorted(
        {"person", "tool", "module"} - R.FUZZY_KINDS - R.NONLINK_KINDS))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return FINDINGS.empty_table()
        ents = ray.get(eref)
        t = t.filter(pc.is_in(t.column("kind"), value_set=exact_kinds))
        joined = t.join(ents.select(["kind", "norm", "canonical"]),
                        keys=["kind", "norm"], join_type="inner")
        hot = joined.filter(pc.greater_equal(joined.column("n"),
                                             HOT_ENTITY_MIN))
        ev = pc.binary_join_element_wise(
            hot.column("kind").cast(pa.string()),
            hot.column("canonical").cast(pa.string()),
            pc.cast(hot.column("n"), pa.string()), ":")
        n = hot.num_rows
        return pa.Table.from_arrays(
            [pa.array(["hot-entity"] * n, pa.string()),
             pa.array(["info"] * n, pa.string()),
             pa.nulls(n, pa.string()),
             pa.nulls(n, pa.int32()),
             ev.combine_chunks() if isinstance(ev, pa.ChunkedArray) else ev],
            schema=FINDINGS)
    return counts.map_batches(finish, batch_format="pyarrow")


def scan(transcripts_ds: "ray.data.Dataset",
         extra_rules: list | None = None) -> "ray.data.Dataset":
    """Run every transcript-level rule; findings = union of per-rule
    outputs (ScanPass).  Per-turn rules fuse into ONE map over the stream;
    conversation-level rules share one aggregation pass.

    extra_rules: externally-loaded per-batch rule functions
    (state.config.config_findings_rules — the querydb-plugin surface),
    fused into the same single pass."""
    builtin = [_rule_large_tool_result, _rule_long_turn, _rule_acquisition,
               _rule_question_turn, _rule_negated_fact, _rule_empty_turn,
               _rule_meeting, _rule_small_tool_result, _rule_bug_report]
    rules = builtin + list(extra_rules or [])
    per_turn = transcripts_ds.map_batches(
        lambda t: pa.concat_tables([r(t) for r in rules]),
        batch_format="pyarrow", zero_copy_batch=True)
    return per_turn.union(_conv_level_rules(transcripts_ds))


def findings(sf_dir: str):
    """Full battery: transcript-level scan ∪ entity-level rules."""
    return scan(ray.data.read_parquet(synth.transcripts_path(sf_dir))) \
        .union(hot_entity_rule(sf_dir))


def findings_sql(transcripts_rel: str) -> str:
    from ..extract import sqlgen as G
    return f"""
    SELECT 'large-tool-result' AS rule, 'warning' AS severity, conv_id,
           turn_idx, tool AS evidence
    FROM {transcripts_rel}
    WHERE role = 'tool'
      AND regexp_matches(text, '^result: ok \\(([0-9]+) items\\)$')
      AND CAST(regexp_extract(text, '^result: ok \\(([0-9]+) items\\)$', 1)
               AS BIGINT) > {LARGE_RESULT_MIN}
    UNION ALL
    SELECT 'small-tool-result', 'info', conv_id, turn_idx, tool
    FROM {transcripts_rel}
    WHERE role = 'tool'
      AND regexp_matches(text, '^result: ok \\(([0-9]+) items\\)$')
      AND CAST(regexp_extract(text, '^result: ok \\(([0-9]+) items\\)$', 1)
               AS BIGINT) < {SMALL_RESULT_MAX}
    UNION ALL
    SELECT 'long-turn', 'info', conv_id, turn_idx,
           CAST(len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)), '\\s+')) AS VARCHAR)
    FROM {transcripts_rel}
    WHERE CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)), '\\s+')) END
          > {LONG_TURN_TOKENS}
    UNION ALL
    SELECT 'org-acquisition', 'info', conv_id, turn_idx, text
    FROM {transcripts_rel}
    WHERE regexp_matches(text, '^[A-Z][A-Za-z ]+ acquired ')
    UNION ALL
    SELECT 'question-turn', 'info', conv_id, turn_idx, text
    FROM {transcripts_rel}
    WHERE role = 'user' AND ends_with(text, '?')
    UNION ALL
    SELECT 'negated-fact', 'warning', conv_id, turn_idx, text
    FROM {transcripts_rel} WHERE contains(text, 'no longer ')
    UNION ALL
    SELECT 'empty-turn', 'warning', conv_id, turn_idx, role
    FROM {transcripts_rel} WHERE trim(text, ' ' || chr(9) || chr(10) || chr(12) || chr(13)) = ''
    UNION ALL
    SELECT 'person-meeting', 'info', conv_id, turn_idx, text
    FROM {transcripts_rel} WHERE contains(text, ' met with ')
    UNION ALL
    SELECT 'bug-report', 'warning', conv_id, turn_idx,
           regexp_extract(text,
             ' reported a bug in ([a-z_]+(\\.[a-z_]+)*)[.?]$', 1)
    FROM {transcripts_rel}
    WHERE regexp_matches(text,
            ' reported a bug in ([a-z_]+(\\.[a-z_]+)*)[.?]$')
    UNION ALL
    SELECT 'repeat-caller', 'info', conv_id, NULL, CAST(n_tool AS VARCHAR)
    FROM (SELECT conv_id,
                 CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_tool
          FROM {transcripts_rel} GROUP BY conv_id)
    WHERE n_tool >= {REPEAT_CALLER_MIN}
    UNION ALL
    SELECT 'long-conversation', 'info', conv_id, NULL,
           CAST(n_turns AS VARCHAR)
    FROM (SELECT conv_id, count(*) AS n_turns
          FROM {transcripts_rel} GROUP BY conv_id)
    WHERE n_turns >= {LONG_CONV_TURNS}
    UNION ALL
    SELECT 'no-tool-conversation', 'info', conv_id, NULL,
           CAST(n_turns AS VARCHAR)
    FROM (SELECT conv_id, count(*) AS n_turns,
                 CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_tool
          FROM {transcripts_rel} GROUP BY conv_id)
    WHERE n_tool = 0
    UNION ALL
    SELECT 'question-heavy', 'info', conv_id, NULL, CAST(n_q AS VARCHAR)
    FROM (SELECT conv_id,
                 CAST(sum(CASE WHEN role = 'user' AND ends_with(text, '?')
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_q
          FROM {transcripts_rel} GROUP BY conv_id)
    WHERE n_q >= {QUESTION_HEAVY_MIN}
    UNION ALL
    SELECT 'hot-entity', 'info', NULL, NULL,
           kind || ':' || norm || ':' || CAST(n AS VARCHAR)
    FROM (
      SELECT kind, norm, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT subj_kind AS kind,
               {G._norm_expr('subj', 'subj_kind')} AS norm
        FROM ({G.resolved_triples_sql(transcripts_rel)})
        UNION ALL
        SELECT obj_kind, {G._norm_expr('obj', 'obj_kind')}
        FROM ({G.resolved_triples_sql(transcripts_rel)}))
      WHERE kind IN ('person', 'tool', 'module')
      GROUP BY kind, norm)
    WHERE n >= {HOT_ENTITY_MIN}
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
