"""Driver fast paths must equal the distributed paths exactly."""

import pyarrow as pa

from joern_ray import synth
from joern_ray.pipelines import kg
from joern_ray.stages import extract as X
from joern_ray.stages import link as L
from joern_ray.stages import materialize as M


def _sorted_rows(ds):
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")
         if b.num_columns])
    return sorted(map(tuple, zip(*[c.to_pylist() for c in t.columns])))


def test_entities_driver_equals_distributed(ray_session, sf_small):
    ds = kg.read_transcripts(synth.transcripts_path(sf_small))
    triples = X.extract_triples(ds).materialize()
    mentions = triples.map_batches(L.mentions_from_triples,
                                   batch_format="pyarrow")
    vocab = L.vocab_from_mentions(mentions).materialize()
    fast = L.build_entities(vocab, distributed=False)
    slow = L.build_entities(vocab, distributed=True)
    assert _sorted_rows(fast) == _sorted_rows(slow)


def test_entity_nodes_local_equals_distributed(ray_session, sf_small):
    ds = kg.read_transcripts(synth.transcripts_path(sf_small))
    triples = X.extract_triples(ds).materialize()
    mentions = triples.map_batches(L.mentions_from_triples,
                                   batch_format="pyarrow")
    entities = L.build_entities(
        L.vocab_from_mentions(mentions)).materialize()
    fast = M.entity_nodes(entities, distributed=False)
    slow = M.entity_nodes(entities, distributed=True)
    assert _sorted_rows(fast) == _sorted_rows(slow)


def test_extract_bucketed_equals_per_conversation(ray_session, sf_small):
    ds = kg.read_transcripts(synth.transcripts_path(sf_small))
    bucketed = X.extract_triples(ds)
    per_conv = X.extract_triples(ds, resolve_buckets=None)
    assert _sorted_rows(bucketed) == _sorted_rows(per_conv)


def test_canonical_cogroup_equals_broadcast(ray_session, sf_small):
    ds = kg.read_transcripts(synth.transcripts_path(sf_small))
    triples = X.extract_triples(ds).materialize()
    entities = L.build_entities(L.vocab_from_mentions(
        triples.map_batches(L.mentions_from_triples,
                            batch_format="pyarrow"))).materialize()
    bcast = M.canonical_triples(triples, M.entity_lookup_ref(entities))
    cogrp = M.canonical_triples_cogroup(triples, entities)
    assert _sorted_rows(bcast) == _sorted_rows(cogrp)


def test_canonical_cogroup_duplicate_turns(ray_session):
    # ADVICE repro: duplicate (conv_id, turn_idx) triples must not
    # cross-join on the cogroup path — row identity flows structurally
    # through the bucketed resolve passes, never via a merge-back key.
    import ray.data
    from joern_ray import schema as S

    rows = [
        ("c1", 0, "Alice", "works_at", "Acme", "person", "org",
         0, False, False, False, "simple", None, False, 0, "main"),
        ("c1", 0, "Bob", "met", "Carol", "person", "person",
         1, False, False, True, "simple", None, False, 0, "main"),
        ("c1", 0, "c1", "invoked", "search", "conv", "tool",
         0, False, False, False, "simple", None, False, 0, "main"),
        ("c2", 3, "Dave", "uses", "editor", "person", "tool",
         0, True, False, False, "progressive", 2019, True, 1, "quoted"),
    ]
    t = pa.Table.from_pydict(
        {f.name: [r[i] for r in rows]
         for i, f in enumerate(S.TRIPLES_SURFACE)}, schema=S.TRIPLES_SURFACE)
    triples = ray.data.from_arrow(t).repartition(2)
    from joern_ray.stages import link as L2
    entities = L2.build_entities(L2.vocab_from_mentions(
        triples.map_batches(L2.mentions_from_triples,
                            batch_format="pyarrow"))).materialize()
    bcast = _sorted_rows(
        M.canonical_triples(triples, M.entity_lookup_ref(entities)))
    cogrp = _sorted_rows(M.canonical_triples_cogroup(triples, entities))
    assert len(cogrp) == len(rows)
    assert bcast == cogrp
