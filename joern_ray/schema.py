"""Arrow schemas for every table family in the engine (SURVEY.md §1.3).

The reference models everything as one typed property graph with a fixed,
code-generated schema (NodeTypes/EdgeTypes in the external
codepropertygraph dependency; validation at Ast construction,
``x2cpg/src/main/scala/io/joern/x2cpg/Ast.scala:55-64``).  Here the graph is
two Parquet table families (nodes/edges) plus intermediate relation tables,
each with an explicit ``pyarrow.Schema`` enforced at stage boundaries.
"""

from __future__ import annotations

import pyarrow as pa

# Input transcripts (BASELINE input_hint shape)
TRANSCRIPTS = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

# Stage-A output: per-sentence extraction events (text never leaves this
# stage).  sent_idx/negated/in_question are the relation-attribute analog of
# the fork's DependencyJsonGenerator per-relation attributes
# (is_modified/used_in_branch/used_in_index,
# ``DependencyJsonGenerator.scala:278-292``).
#
# This table is the single biggest object-store resident of the headline
# build (materialized once, read by both the passthrough and resolve
# branches), so its layout is store-optimized: there is NO etype column —
# the invariant ``subj IS NULL ⇔ pronoun event`` carries that bit — and
# EVERY vocabulary-sized column (pred / kinds / clause AND the subj / obj
# entity surfaces, which are vocabulary-drawn too — r4) is
# dictionary-encoded (int32 index + tiny dictionary per chunk) instead of
# repeating its strings per row; NULL discriminators survive encoding as
# null indices.  Downstream schemas (TRIPLES_SURFACE on) decode back to
# plain strings at the passthrough map, after the store hop.
EVENTS_DICT = pa.dictionary(pa.int32(), pa.string())
EVENTS = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("subj", EVENTS_DICT),           # NULL ⇔ subject-pronoun event
    ("pred", EVENTS_DICT),
    ("obj", EVENTS_DICT),            # NULL ⇔ object-pronoun event
    ("subj_kind", EVENTS_DICT),
    ("obj_kind", EVENTS_DICT),
    ("sent_idx", pa.int32()),        # sentence position within the turn
    ("negated", pa.bool_()),         # 'no longer' modifier present
    ("in_question", pa.bool_()),     # sentence ends with '?'
    ("is_past", pa.bool_()),         # v24 tense attribute (rules.PAST_RE)
    ("aspect", EVENTS_DICT),         # v27: simple | progressive | perfect
    ("since_year", pa.int32()),      # v33: sentence-final 'since <year>'
                                     # temporal adjunct; NULL when absent
    ("hedged", pa.bool_()),          # v36: 'reportedly' hedge adverb
    ("slot_idx", pa.int32()),        # subject position in a coordinated list
    ("clause", EVENTS_DICT),         # main | appositive | relative | quoted
    # definite-description events ONLY (v12): the module key the descriptor
    # resolves against.  Invariant: subj IS NULL ∧ desc_key IS NOT NULL ⇔
    # descriptor event; subj IS NULL ∧ desc_key IS NULL ⇔ subject-pronoun
    # event.  NULL (a bitmap bit + null dictionary index) on all other rows.
    ("desc_key", EVENTS_DICT),
])

# Surface-level triples (post pronoun resolution; surfaces not yet canonical)
TRIPLES_SURFACE = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_kind", pa.string()),
    ("obj_kind", pa.string()),
    ("sent_idx", pa.int32()),
    ("negated", pa.bool_()),
    ("in_question", pa.bool_()),
    ("is_past", pa.bool_()),
    ("aspect", pa.string()),
    ("since_year", pa.int32()),
    ("hedged", pa.bool_()),
    ("slot_idx", pa.int32()),
    ("clause", pa.string()),
])

# Mentions: one row per entity slot occurrence
MENTIONS = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("kind", pa.string()),
    ("surface", pa.string()),
    ("norm", pa.string()),
])

# Canonical entity directory (post linking + union-find)
ENTITIES = pa.schema([
    ("kind", pa.string()),
    ("norm", pa.string()),           # normalized member key
    ("canonical", pa.string()),      # representative norm of its component
    ("entity_id", pa.string()),      # blake2b(kind:canonical)
])

# Graph tables (analog of the reference's flatgraph node/edge layout)
NODES = pa.schema([
    ("node_id", pa.string()),
    ("label", pa.string()),          # ENTITY | CONVERSATION | TURN
    ("kind", pa.string()),           # entity kind; null otherwise
    ("name", pa.string()),           # canonical name / conv_id / turn key
    ("conv_id", pa.string()),        # for TURN/CONVERSATION nodes
    ("turn_idx", pa.int32()),        # for TURN nodes
    ("role", pa.string()),           # for TURN nodes
    ("text", pa.string()),           # for TURN nodes (per-turn text equality)
])

EDGES = pa.schema([
    ("src", pa.string()),
    ("dst", pa.string()),
    ("label", pa.string()),          # NEXT_TURN | MENTIONS | FACT | INVOKED
    ("pred", pa.string()),           # FACT predicate; null otherwise
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
])

# Canonical triples (endpoints rewritten to entity ids + canonical names)
TRIPLES_CANONICAL = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("subj_id", pa.string()),
    ("subj_kind", pa.string()),
    ("subj_canonical", pa.string()),
    ("pred", pa.string()),
    ("obj_id", pa.string()),
    ("obj_kind", pa.string()),
    ("obj_canonical", pa.string()),
])


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def cast_to(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Strict-mode schema enforcement at a stage boundary (ValidationMode
    analog).  Reorders columns and casts; raises on missing columns."""
    cols = [table.column(f.name).cast(f.type) for f in schema]
    return pa.Table.from_arrays(cols, schema=schema)
