"""Import/config side-table passes.

Reference analogs: ``x2cpg/passes/frontend/XImportResolverPass.scala:1-46``
(textual import statements resolved to known entities → REF side-table) and
``XConfigFileCreationPass.scala`` (non-code artifacts lifted into their own
node table).  Transcript analog: assistant turns announcing a tool call
("Calling <tool> now.") are textual references that resolve against the
tool directory — a distinct artifact from the tool-role invocation rows
(the actual calls), exactly like imports vs call sites.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_CALL_RE = r"^Calling (?P<t>[a-z0-9_]+) now\.$"

IMPORT_REFS = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("tool_norm", pa.string()),
])


def import_refs(transcripts_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Announcement turns → resolved (conv, turn, tool_norm) reference rows
    (one vectorized RE2 kernel; resolution = the tool kind's exact-norm
    discipline, i.e. lowercase — tools never go through fuzzy linking)."""
    def fn(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column("text"), _CALL_RE)
        tool = pc.struct_field(ex, "t")
        mask = pc.fill_null(pc.is_valid(tool), False)
        sub = t.filter(mask)
        tool = tool.filter(mask)
        return pa.Table.from_arrays(
            [sub.column("conv_id").cast(pa.string()),
             sub.column("turn_idx").cast(pa.int32()),
             pc.utf8_lower(tool)],
            schema=IMPORT_REFS)
    return transcripts_ds.map_batches(fn, batch_format="pyarrow")


def tool_registry(transcripts_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Config-file side-table analog: one registry row per distinct tool
    with usage stats (two-phase: per-batch partials, small global groupby).
    """
    from ray.data.aggregate import Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.and_(pc.equal(t.column("role"), "tool"),
                                    pc.is_valid(t.column("tool"))), False)
        sub = t.filter(mask)
        return (pa.table({"tool": sub.column("tool"),
                          "n": pa.array([1] * sub.num_rows, pa.int64()),
                          "first_turn": sub.column("turn_idx").cast(pa.int64())})
                .group_by("tool")
                .aggregate([("n", "sum"), ("first_turn", "min")])
                .rename_columns(["tool", "n", "first_turn"]))

    out_schema = pa.schema([("tool", pa.string()),
                            ("n_invocations", pa.int64()),
                            ("first_turn", pa.int64())])
    return (transcripts_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("tool")
            .aggregate(Sum(on="n", alias_name="n_invocations"),
                       Min(on="first_turn", alias_name="first_turn"))
            .map_batches(
                lambda t: (t.select(["tool", "n_invocations", "first_turn"])
                           if t.num_columns else out_schema.empty_table()),
                batch_format="pyarrow"))
