"""Incremental KG append (pipelines/incremental.py) — the
frozen-directory continuous-crawl contract.

Equivalence: incremental(base + delta) == full(base + delta) whenever
the delta introduces no bridge between existing base clusters; the
bridge case diverges EXACTLY as documented (base stays frozen).
"""

import pyarrow as pa

import ray.data

from joern_ray import synth
from joern_ray.pipelines import incremental as INC
from joern_ray.pipelines import kg


def _tds(rows):
    return ray.data.from_arrow(pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": ["user"] * len(rows),
        "text": [r[2] for r in rows],
        "tool": pa.array([None] * len(rows), pa.string()),
    }))


def _canon_multiset(ds):
    return sorted(tuple(r.get(k) for k in sorted(r)) for r in ds.take_all())


def _entities_map(ds_or_tab):
    rows = (ds_or_tab.to_pylist() if isinstance(ds_or_tab, pa.Table)
            else ds_or_tab.take_all())
    return {(r["kind"], r["norm"]): (r["canonical"], r["entity_id"])
            for r in rows}


BASE = [
    ("b1", 0, "Alice works at Acme Corp."),
    ("b1", 1, "Bob uses search daily."),
    ("b2", 0, "Carol works at Globex Corp."),
]


def test_append_known_surfaces_reuses_ids(ray_session):
    """A delta mentioning ONLY known surfaces mints no entities and its
    canonical triples carry the base entity ids."""
    base = kg.build_graph(_tds(BASE))
    delta = [("d1", 0, "Dave works at Acme Corp.")]
    out = INC.append_shard(base["entities"], _tds(delta))
    new_ents = _entities_map(out["entities_delta"])
    assert all(k != "org" or n != "acme" for k, n in new_ents)
    base_map = _entities_map(base["entities"])
    # Dave is a new person entity; Acme resolves to the base id
    canon = out["triples_canonical_delta"].take_all()
    acme = [r for r in canon if r["obj_canonical"] == "acme"]
    assert acme and all(r["obj_id"] == base_map[("org", "acme")][1]
                        for r in acme)


def test_append_new_surface_is_frozen_directory_stable(ray_session):
    """New org surfaces adopt an existing cluster's canonical when they
    fuzzy-match it (one-way), and base rows never change."""
    base = kg.build_graph(_tds(BASE))
    base_before = _entities_map(base["entities"])
    # 'Acmee Corp' is the synth typo shape — links into the acme cluster
    delta = [("d1", 0, "Erin works at Acmee Corp.")]
    out = INC.append_shard(base["entities"], _tds(delta))
    d = _entities_map(out["entities_delta"])
    assert d[("org", "acmee")][0] == "acme"
    assert d[("org", "acmee")][1] == base_before[("org", "acme")][1]
    merged = _entities_map(out["entities_merged"])
    for key, val in base_before.items():
        assert merged[key] == val          # frozen base rows


def test_incremental_equals_full_without_bridges(ray_session):
    """On a real synth corpus split 90/10 by conv hash, the incremental
    append's canonical triples for the delta equal the full rebuild's
    triples for those conversations (the corpus's org surfaces are base
    typo + canonical pairs — no delta-only bridges)."""
    import pandas as pd
    import numpy as np

    rows_tab, _ = synth.generate_corpus(120)
    h = pd.util.hash_array(rows_tab.column("conv_id").to_numpy(
        zero_copy_only=False).astype(object)) % np.uint64(10)
    base_tab = rows_tab.filter(pa.array(h != 0))
    delta_tab = rows_tab.filter(pa.array(h == 0))
    assert delta_tab.num_rows and base_tab.num_rows

    base = kg.build_graph(ray.data.from_arrow(base_tab))
    out = INC.append_shard(base["entities"],
                           ray.data.from_arrow(delta_tab))
    inc_rows = [r for r in out["triples_canonical_delta"].take_all()]

    full = kg.build_graph(ray.data.from_arrow(rows_tab))
    delta_convs = set(delta_tab.column("conv_id").to_pylist())
    full_rows = [r for r in full["triples_canonical"].take_all()
                 if r["conv_id"] in delta_convs]

    def key(rows):
        return sorted(tuple(r.get(k) for k in sorted(r)) for r in rows)
    assert key(inc_rows) == key(full_rows)


def test_bridge_divergence_is_the_documented_one(ray_session):
    """A delta surface bridging two base clusters does NOT merge them —
    it adopts the smaller canonical; the full rebuild WOULD merge.  This
    is the frozen-directory trade, asserted so the contract stays
    load-bearing."""
    # surfaces chosen by computed jaccard/band structure:
    # j(initech, initechsoftly) = 0.47 < 0.5 (no base link), while the
    # bridge 'initechsof' matches both (0.58 / 0.67) with band
    # collisions on both sides
    base_rows = [
        ("b1", 0, "Alice works at Initech Corp."),
        ("b2", 0, "Bob works at Initechsoftly Corp."),
    ]
    base = kg.build_graph(_tds(base_rows))
    bm = _entities_map(base["entities"])
    assert bm[("org", "initech")][0] != bm[("org", "initechsoftly")][0]
    delta = [("d1", 0, "Carol works at Initechsof Corp.")]
    out = INC.append_shard(base["entities"], _tds(delta))
    d = _entities_map(out["entities_delta"])
    # the bridge adopts the min base canonical; base rows stay frozen
    assert d[("org", "initechsof")][0] == min(
        bm[("org", "initech")][0], bm[("org", "initechsoftly")][0])
    merged = _entities_map(out["entities_merged"])
    assert merged[("org", "initech")] == bm[("org", "initech")]
    assert merged[("org", "initechsoftly")] == bm[("org", "initechsoftly")]


def test_unseen_vocab_broadcast_equals_cogroup(ray_session):
    """The anti-join's broadcast and cogroup arms agree."""
    base = kg.build_graph(_tds(BASE))
    delta = [("d1", 0, "Erin works at Quokka Ventures."),
             ("d1", 1, "Alice uses search daily.")]
    from joern_ray.stages import link as L
    triples, _ev = __import__(
        "joern_ray.stages.extract", fromlist=["x"]
    ).extract_triples_and_events(_tds(delta))
    vocab = L.vocab_from_mentions(
        triples.map_batches(L.mentions_from_triples,
                            batch_format="pyarrow"))

    def key(ds):
        return sorted((r["kind"], r["norm"]) for r in ds.take_all())
    a = key(INC.unseen_vocab(vocab, base["entities"], distributed=False))
    b = key(INC.unseen_vocab(vocab, base["entities"], distributed=True))
    assert a == b
    assert any(k == "org" and n.startswith("quokka") for k, n in a)
    assert all(n != "alice" for _k, n in a)   # known person stays seen
