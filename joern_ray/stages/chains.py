"""Conversation-local enrichment: same-entity mention chains.

The REACHING_DEF / use-chain analog (SURVEY.md §7 step 7; reference:
``dataflowengineoss/.../reachingdef/DdgGenerator.scala:30-80`` links a
definition to its next uses): for every entity mentioned in a conversation,
emit an edge from each mention turn to the entity's next mention turn.

Conversation-local ⇒ the shuffle key is the conversation hash bucket (the
same partitioning assumption as pronoun resolution: a conversation's
mentions fit one group; buckets sized so a bucket fits a worker heap)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .extract import DEFAULT_RESOLVE_BUCKETS, extract_triples
from .link import normalize_arrays

CHAINS = pa.schema([
    ("conv_id", pa.string()),
    ("kind", pa.string()),
    ("norm", pa.string()),
    ("from_turn", pa.int32()),
    ("to_turn", pa.int32()),
])


def _mention_turns(batch: pa.Table, n_buckets: int) -> pa.Table:
    """Triple batch → distinct (bucket, conv, turn, kind, norm) mention
    rows (narrow: shuffle keys only, never surfaces/text)."""
    parts = []
    for side, kcol in (("subj", "subj_kind"), ("obj", "obj_kind")):
        parts.append(pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx").cast(pa.int32()),
            "kind": batch.column(kcol),
            "norm": normalize_arrays(batch.column(kcol),
                                     batch.column(side)),
        }))
    t = pa.concat_tables(parts)
    t = t.group_by(["conv_id", "turn_idx", "kind", "norm"]).aggregate([])
    h = pd.util.hash_array(t.column("conv_id").to_numpy(
        zero_copy_only=False))
    return t.append_column("bucket",
                           pa.array((h % n_buckets).astype("int64")))


def _chain_bucket(group: pa.Table) -> pa.Table:
    """One bucket of whole conversations → next-mention edges (vectorized
    lag within (conv, kind, norm) after a stable sort)."""
    if group.num_rows == 0:
        return CHAINS.empty_table()
    df = (group.drop_columns(["bucket"]).to_pandas()
          .drop_duplicates(["conv_id", "turn_idx", "kind", "norm"])
          .sort_values(["conv_id", "kind", "norm", "turn_idx"],
                       kind="mergesort", ignore_index=True))
    key = (df["conv_id"].astype(str) + "\x00" + df["kind"].astype(str)
           + "\x00" + df["norm"].astype(str)).to_numpy()
    turn = df["turn_idx"].to_numpy()
    same_as_next = np.empty(len(df), dtype=bool)
    same_as_next[:-1] = key[:-1] == key[1:]
    same_as_next[-1] = False
    idx = np.nonzero(same_as_next)[0]
    out = pa.table({
        "conv_id": pa.array(df["conv_id"].to_numpy()[idx], pa.string()),
        "kind": pa.array(df["kind"].to_numpy()[idx], pa.string()),
        "norm": pa.array(df["norm"].to_numpy()[idx], pa.string()),
        "from_turn": pa.array(turn[idx].astype("int32"), pa.int32()),
        "to_turn": pa.array(turn[idx + 1].astype("int32"), pa.int32()),
    })
    return out


def mention_chains(triples_ds: "ray.data.Dataset",
                   *, n_buckets: int = DEFAULT_RESOLVE_BUCKETS
                   ) -> "ray.data.Dataset":
    keyed = triples_ds.map_batches(
        lambda t: _mention_turns(t, n_buckets), batch_format="pyarrow")
    return keyed.groupby("bucket").map_groups(
        _chain_bucket, batch_format="pyarrow")


def mention_chains_query(sf_dir: str):
    from .. import synth
    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    return mention_chains(extract_triples(tds))


COOCCUR_MAX_ENTITIES_PER_CONV = 64


def cooccurrence(triples_ds: "ray.data.Dataset",
                 *, n_buckets: int = DEFAULT_RESOLVE_BUCKETS
                 ) -> "ray.data.Dataset":
    """(entity a, entity b) → number of conversations mentioning both —
    the co-occurrence edge weight every KG ranking layer wants.  Shape:
    per-batch distinct mention keys → conversation-bucket groupby → per-conv
    sorted pair explosion (capped, the bail-out discipline) → two-phase
    pair count.  Entities are 'kind:norm' composite strings; a<b."""
    import numpy as np
    from ray.data.aggregate import Sum

    def conv_entities(t: pa.Table) -> pa.Table:
        parts = []
        for side, kcol in (("subj", "subj_kind"), ("obj", "obj_kind")):
            key = pc.binary_join_element_wise(
                pc.cast(t.column(kcol), pa.string()),
                normalize_arrays(t.column(kcol), t.column(side)), ":")
            parts.append(pa.table({"conv_id": t.column("conv_id"),
                                   "entity": key}))
        u = pa.concat_tables(parts).group_by(["conv_id", "entity"]) \
            .aggregate([])
        h = pd.util.hash_array(u.column("conv_id").to_numpy(
            zero_copy_only=False))
        return u.append_column("bucket",
                               pa.array((h % n_buckets).astype("int64")))

    def pairs(group: pa.Table) -> pa.Table:
        df = (group.drop_columns(["bucket"]).to_pandas()
              .drop_duplicates(["conv_id", "entity"])
              .sort_values(["conv_id", "entity"], kind="mergesort"))
        a_out, b_out = [], []
        for _, g in df.groupby("conv_id", sort=False):
            ents = g["entity"].tolist()[:COOCCUR_MAX_ENTITIES_PER_CONV]
            for i in range(len(ents)):
                for j in range(i + 1, len(ents)):
                    a_out.append(ents[i])
                    b_out.append(ents[j])
        t = pa.table({"a": pa.array(a_out, pa.string()),
                      "b": pa.array(b_out, pa.string())})
        # local combiner before the global pair count
        return (t.group_by(["a", "b"]).aggregate([("b", "count")])
                .rename_columns(["a", "b", "n"]))

    keyed = triples_ds.map_batches(conv_entities, batch_format="pyarrow")
    return (keyed.groupby("bucket").map_groups(pairs,
                                               batch_format="pyarrow")
            .groupby(["a", "b"]).aggregate(Sum(on="n", alias_name="n_convs"))
            .map_batches(
                lambda t: t.select(["a", "b", "n_convs"])
                if t.num_columns else
                pa.schema([("a", pa.string()), ("b", pa.string()),
                           ("n_convs", pa.int64())]).empty_table(),
                batch_format="pyarrow"))


def cooccurrence_query(sf_dir: str):
    from .. import synth
    tds = ray.data.read_parquet(synth.transcripts_path(sf_dir))
    return cooccurrence(extract_triples(tds))


def cooccurrence_sql(rel: str) -> str:
    # Mirrors the engine's COOCCUR_MAX_ENTITIES_PER_CONV bail-out cap (the
    # engine keeps the first 64 entities per conversation in ascending
    # entity order before pair explosion) so engine and oracle cannot
    # silently diverge on a >64-entity conversation.
    from ..extract import sqlgen as G
    ne = G._norm_expr
    return f"""
    WITH resolved AS ({G.resolved_triples_sql(rel)}),
    m0 AS (
      SELECT DISTINCT conv_id,
             subj_kind || ':' || {ne('subj', 'subj_kind')} AS entity
      FROM resolved
      UNION
      SELECT DISTINCT conv_id,
             obj_kind || ':' || {ne('obj', 'obj_kind')} FROM resolved),
    m AS (
      SELECT conv_id, entity FROM (
        SELECT conv_id, entity,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY entity) AS rn
        FROM m0)
      WHERE rn <= {COOCCUR_MAX_ENTITIES_PER_CONV})
    SELECT x.entity AS a, y.entity AS b,
           CAST(count(*) AS BIGINT) AS n_convs
    FROM m x JOIN m y ON x.conv_id = y.conv_id AND x.entity < y.entity
    GROUP BY 1, 2
    """


def mention_chains_sql(rel: str) -> str:
    from ..extract import sqlgen as G
    ne = G._norm_expr  # shared normalizer SQL
    return f"""
    WITH resolved AS ({G.resolved_triples_sql(rel)}),
    m AS (
      SELECT DISTINCT conv_id, turn_idx, kind, norm FROM (
        SELECT conv_id, turn_idx, subj_kind AS kind,
               {ne('subj', 'subj_kind')} AS norm FROM resolved
        UNION ALL
        SELECT conv_id, turn_idx, obj_kind, {ne('obj', 'obj_kind')}
        FROM resolved)),
    lagged AS (
      SELECT conv_id, kind, norm, turn_idx AS from_turn,
             lead(turn_idx) OVER (PARTITION BY conv_id, kind, norm
                                  ORDER BY turn_idx) AS to_turn
      FROM m)
    SELECT conv_id, kind, norm, from_turn, to_turn
    FROM lagged WHERE to_turn IS NOT NULL
    """
