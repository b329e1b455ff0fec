"""Flagship pipeline: transcripts → knowledge graph (nodes/edges Parquet).

Stage graph (each stage = Dataset→Dataset; shuffle boundaries marked):

  transcripts ──map_batches──► events ──groupby(conv_id)*──► triples_surface
  triples_surface ──map_batches──► mentions ──groupby(kind,norm)*──► vocab
  vocab ──LSH groupby* + union-find*──► entities  (small table)
  triples_surface ──map_batches + broadcast(entities)──► triples_canonical
  transcripts ──map_batches──► turn/conv nodes     (no shuffle)
  entities ──groupby*──► entity nodes              (small)
  transcripts + triples_canonical ──map_batches──► edges (no extra shuffle)

(*) = all-to-all exchange.  Only extraction-event/vocab-sized rows are ever
shuffled; the wide ``text`` column moves exclusively through narrow
map_batches stages (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .. import schema as S
from ..stages import extract as X
from ..stages import link as L
from ..stages import materialize as M
from ..state.manifest import Manifest

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool"]


def read_transcripts(path: str) -> "ray.data.Dataset":
    """Column-pruned read: `ts` is never needed by the KG build."""
    return ray.data.read_parquet(path, columns=TRANSCRIPT_COLUMNS)


def read_turn_keys(path: str) -> "ray.data.Dataset":
    """(conv_id, turn_idx, role) only — feeds every stage that never looks
    at text (conversation nodes, next-turn/replies-to edges): the wide text
    column is decoded exactly once per sink that actually needs it."""
    return ray.data.read_parquet(path,
                                 columns=["conv_id", "turn_idx", "role"])


def read_turn_text(path: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        path, columns=["conv_id", "turn_idx", "role", "text"])


def read_transcripts_partitioned(pdir: str, *,
                                 conv_ids: list[str] | None = None,
                                 buckets: list[int] | None = None,
                                 columns: list[str] | None = None
                                 ) -> "ray.data.Dataset":
    """Enumeration-pruned read over the hash-partitioned corpus layout
    (``synth.ensure_corpus_partitioned``): a conv_id (or bucket) predicate
    maps to its bucket directories BEFORE the read — whole files are
    skipped at enumeration, the ``SourceFiles.determine`` discipline
    (``x2cpg/.../SourceFiles.scala:67-96``), not filtered after scanning.
    ``columns=`` additionally skips the unselected column chunks inside
    the files that are read.  Row-exact: a conv_ids predicate still
    applies the exact filter map-side (the bucket prune is a superset)."""
    import os

    from .. import synth

    if buckets is None and conv_ids is not None:
        buckets = sorted({synth.conv_bucket(c) for c in conv_ids})
    cols = columns if columns is not None else TRANSCRIPT_COLUMNS
    paths = ([os.path.join(pdir, f"bucket={b}") for b in sorted(buckets)]
             if buckets is not None else [pdir])
    ds = ray.data.read_parquet(paths, columns=cols)
    if conv_ids is not None:
        import pyarrow as pa
        import pyarrow.compute as pc
        want = pa.array(sorted(set(conv_ids)))
        ds = ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column("conv_id"),
                                        value_set=want)),
            batch_format="pyarrow")
    return ds


def conversation_nodes(transcripts_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """One CONVERSATION node per conv, derived shuffle-free from the turn-0
    row every conversation has (instead of a distinct over all rows)."""
    def fn(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t.column("turn_idx"), 0))
        n = sub.num_rows
        conv = sub.column("conv_id").cast(pa.string())
        return pa.Table.from_arrays(
            [conv, pa.array(["CONVERSATION"] * n, pa.string()),
             pa.array(["conv"] * n, pa.string()), conv, conv,
             pa.nulls(n, pa.int32()), pa.nulls(n, pa.string()),
             pa.nulls(n, pa.string())],
            schema=S.NODES)
    return transcripts_ds.map_batches(fn, batch_format="pyarrow")


def build_graph(transcripts_ds: "ray.data.Dataset", *,
                turn_keys_ds: "ray.data.Dataset | None" = None,
                turn_text_ds: "ray.data.Dataset | None" = None,
                fused_recovery: bool = False) -> dict:
    """In-memory (lazy) build; returns the dict of result Datasets.

    turn_keys_ds / turn_text_ds: optional column-pruned reads of the same
    table (see read_turn_keys/read_turn_text) so text is decoded once per
    text-consuming sink; both default to the full Dataset.

    fused_recovery: route extraction through the fused resolver +
    kind-recovery-stage-1 exchange (``kindrec.extract_with_recovery`` —
    semantically identical, equivalence-tested; two fewer events passes
    and one fewer keyed exchange).  Off by default: the r4 sf0.1 A/B
    measured it 25% SLOWER on this box (commit 0886cb3) — wired behind a
    flag so the A/B can be re-run at the 32M scaling scale where the
    sf0.1 comparison was too noisy to credit."""
    if turn_keys_ds is None:
        turn_keys_ds = transcripts_ds
    if turn_text_ds is None:
        turn_text_ds = transcripts_ds
    # events (inside extract_triples) + the small resolved branch are
    # materialized; triples stays lazy — re-consumers only replay the
    # cheap passthrough map over stored events, never the shuffle
    rec_surface = None
    if fused_recovery:
        from ..stages import kindrec as _KR
        triples, events, rec_surface = _KR.extract_with_recovery(
            transcripts_ds)
    else:
        triples, events = X.extract_triples_and_events(transcripts_ds)
    mentions = triples.map_batches(L.mentions_from_triples,
                                   batch_format="pyarrow")
    vocab = L.vocab_from_mentions(mentions)
    entities = L.build_entities(vocab).materialize()
    # kind-recovery overlay (XTypeRecovery analog, stages/kindrec.py):
    # untyped "mentioned" objects are typed from the stored events'
    # evidence and rewritten into the canonicalization input — never into
    # the surface-grammar stream or the entity vocabulary (recovery
    # requires an already-typed mention of the same surface, so the
    # (kind, norm) key is guaranteed present in the directory)
    from ..stages import kindrec as KR
    canon_input = triples.union(
        rec_surface if rec_surface is not None
        else KR.recovered_triples(transcripts_ds, events))
    # canonical triples are narrow (ids + kinds, no text): one store copy
    # here saves a full chain replay for each of its two consumers.  The
    # store copy is dictionary-encoded (vocabulary-sized columns as int32
    # indices); consumers replay only the decode map over stored blocks.
    if entities.count() > M.BROADCAST_MAX_ENTITIES:
        # directory too big to broadcast → fully distributed cogroup path
        canon_raw = M.canonical_triples_cogroup(canon_input, entities)
    else:
        canon_raw = M.canonical_triples(
            canon_input, M.entity_lookup_ref(entities))
    canon_store = canon_raw.map_batches(
        M.encode_canonical_store, batch_format="pyarrow").materialize()
    canon = canon_store.map_batches(
        M.decode_canonical_store, batch_format="pyarrow")
    nodes = (turn_text_ds.map_batches(M.turn_nodes, batch_format="pyarrow")
             .union(conversation_nodes(turn_keys_ds))
             .union(M.entity_nodes(entities)))
    edges = (turn_keys_ds.map_batches(M.next_turn_edges,
                                      batch_format="pyarrow")
             .union(turn_keys_ds.map_batches(M.replies_to_edges,
                                             batch_format="pyarrow"))
             .union(M.fact_and_mention_edges(canon)))
    return dict(triples_surface=triples, entities=entities,
                triples_canonical=canon, nodes=nodes, edges=edges)


def build_from_path(path: str, *, fused_recovery: bool = False) -> dict:
    """Column-pruned wiring of build_graph for a parquet path."""
    return build_graph(read_transcripts(path),
                       turn_keys_ds=read_turn_keys(path),
                       turn_text_ds=read_turn_text(path),
                       fused_recovery=fused_recovery)


def build_checkpointed(input_path: str, out_dir: str) -> Manifest:
    """Checkpointed build with resume: completed stages are skipped and
    re-read from their Parquet outputs (overlays-ledger discipline)."""
    man = Manifest(out_dir)
    transcripts = read_transcripts(input_path)

    triples = man.run_stage(
        "triples_surface",
        lambda: X.extract_triples(transcripts),
        deps=["input"], fingerprint=True, shard_by="conv_id")

    entities = man.run_stage(
        "entities",
        lambda: L.build_entities(L.vocab_from_mentions(
            triples.map_batches(L.mentions_from_triples,
                                batch_format="pyarrow"))),
        deps=["triples_surface"], fingerprint=True)

    from ..stages import kindrec as KR
    canon = man.run_stage(
        "triples_canonical",
        lambda: M.canonical_triples(
            triples.union(KR.recovered_triples(transcripts)),
            M.entity_lookup_ref(entities)),
        deps=["triples_surface", "entities"], fingerprint=True,
        shard_by="conv_id")

    man.run_stage(
        "nodes",
        lambda: (transcripts.map_batches(M.turn_nodes, batch_format="pyarrow")
                 .union(conversation_nodes(transcripts))
                 .union(M.entity_nodes(entities))),
        deps=["input", "entities"], fingerprint=True, shard_by="node_id")

    man.run_stage(
        "edges",
        lambda: (transcripts.map_batches(M.next_turn_edges,
                                         batch_format="pyarrow")
                 .union(transcripts.map_batches(M.replies_to_edges,
                                                batch_format="pyarrow"))
                 .union(M.fact_and_mention_edges(canon))),
        deps=["input", "triples_canonical"], fingerprint=True,
        shard_by="src")
    return man
