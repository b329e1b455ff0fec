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
(conv_id, turn_idx±1).  The findings side is broadcast (small), the
transcript side streams — never the reverse.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .. import synth

FINDINGS = pa.schema([
    ("rule", pa.string()),
    ("severity", pa.string()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),      # null for conversation-level rules
    ("evidence", pa.string()),
])

_ITEMS_RE = r"^result: ok \((?P<n>[0-9]+) items\)$"
LARGE_RESULT_MIN = 90
LONG_TURN_TOKENS = 12
REPEAT_CALLER_MIN = 4


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
    trimmed = pc.utf8_trim_whitespace(batch.column("text"))
    n_tokens = pc.if_else(pc.equal(trimmed, ""), 0,
                          pc.add(pc.count_substring_regex(trimmed, r"\s+"), 1))
    mask = pc.greater(n_tokens, LONG_TURN_TOKENS)
    sub = batch.filter(mask)
    ev = pc.cast(pc.if_else(pc.equal(pc.utf8_trim_whitespace(sub.column("text")), ""),
                 0, pc.add(pc.count_substring_regex(
                     pc.utf8_trim_whitespace(sub.column("text")), r"\s+"), 1)),
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


def scan(transcripts_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Run every rule; findings = union of per-rule outputs (ScanPass)."""
    per_turn = transcripts_ds.map_batches(
        lambda t: pa.concat_tables([_rule_large_tool_result(t),
                                    _rule_long_turn(t),
                                    _rule_acquisition(t)]),
        batch_format="pyarrow", zero_copy_batch=True)
    return per_turn.union(_repeat_caller(transcripts_ds))


def findings(sf_dir: str):
    return scan(ray.data.read_parquet(synth.transcripts_path(sf_dir)))


def findings_sql(transcripts_rel: str) -> str:
    return f"""
    SELECT 'large-tool-result' AS rule, 'warning' AS severity, conv_id,
           turn_idx, tool AS evidence
    FROM {transcripts_rel}
    WHERE role = 'tool'
      AND regexp_matches(text, '^result: ok \\(([0-9]+) items\\)$')
      AND CAST(regexp_extract(text, '^result: ok \\(([0-9]+) items\\)$', 1)
               AS BIGINT) > {LARGE_RESULT_MIN}
    UNION ALL
    SELECT 'long-turn', 'info', conv_id, turn_idx,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS VARCHAR)
    FROM {transcripts_rel}
    WHERE CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
          > {LONG_TURN_TOKENS}
    UNION ALL
    SELECT 'org-acquisition', 'info', conv_id, turn_idx, text
    FROM {transcripts_rel}
    WHERE regexp_matches(text, '^[A-Z][A-Za-z ]+ acquired ')
    UNION ALL
    SELECT 'repeat-caller', 'info', conv_id, NULL, CAST(n AS VARCHAR)
    FROM (SELECT conv_id, count(*) AS n FROM {transcripts_rel}
          WHERE role = 'tool' GROUP BY conv_id)
    WHERE n >= {REPEAT_CALLER_MIN}
    """


# ---------------------------------------------------------------------------
# snippet retrieval (CodeDumper analog)
# ---------------------------------------------------------------------------

def snippets(sf_dir: str, *, context: int = 1):
    """Per finding with a turn anchor: surrounding turns' verbatim text.

    Findings (small) are broadcast once; the transcript table streams
    through a filtering map — the broadcast-small-side join pattern."""
    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    f = scan(tds)
    anchors: set[tuple[str, int]] = set()
    for b in f.iter_batches(batch_format="pyarrow"):
        for c, t in zip(b.column("conv_id").to_pylist(),
                        b.column("turn_idx").to_pylist()):
            if t is not None:
                anchors.add((c, t))
    aref = ray.put(anchors)

    def fn(batch: pa.Table) -> pa.Table:
        anc = ray.get(aref)
        convs = batch.column("conv_id").to_pylist()
        tidxs = batch.column("turn_idx").to_pylist()
        out_anchor = []
        keep_idx = []
        for i, (c, t) in enumerate(zip(convs, tidxs)):
            for a in range(t - context, t + context + 1):
                if (c, a) in anc:
                    keep_idx.append(i)
                    out_anchor.append(a)
        sub = batch.take(pa.array(keep_idx, pa.int64()))
        return pa.table({
            "conv_id": sub.column("conv_id"),
            "anchor_turn_idx": pa.array(out_anchor, pa.int32()),
            "turn_idx": sub.column("turn_idx").cast(pa.int32()),
            "role": sub.column("role"),
            "text": sub.column("text"),
        })
    return tds.map_batches(fn, batch_format="pyarrow")


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


def entity_mention_counts(sf_dir: str):
    """(kind, norm) → mention count over both triple slots, with a per-batch
    partial count before the global groupby (hot-entity skew guard)."""
    from ..stages import extract as X
    from ..stages.link import mentions_from_triples

    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    mentions = X.extract_triples(tds).map_batches(
        mentions_from_triples, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        return (t.select(["kind", "norm"]).group_by(["kind", "norm"])
                .aggregate([("norm", "count")])
                .rename_columns(["kind", "norm", "n"]))

    return (mentions.map_batches(partial, batch_format="pyarrow")
            .groupby(["kind", "norm"])
            .aggregate(Sum(on="n", alias_name="n_mentions"))
            .map_batches(
                lambda t: t.select(["kind", "norm", "n_mentions"])
                if t.num_columns else
                pa.schema([("kind", pa.string()), ("norm", pa.string()),
                           ("n_mentions", pa.int64())]).empty_table(),
                batch_format="pyarrow"))
