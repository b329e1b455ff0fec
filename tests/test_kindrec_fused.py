"""Fused resolve + kind-recovery-stage-1 exchange
(``kindrec.extract_with_recovery``): multiset equivalence with the
separate chains (``extract.extract_triples`` + ``recovered_triples``)
on both the planted golden and a real synth corpus."""

import pyarrow as pa

import ray.data

from joern_ray import synth
from joern_ray.stages import extract as X
from joern_ray.stages import kindrec as KR


def _tds(rows):
    return ray.data.from_arrow(pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "tool": pa.array([None] * len(rows), pa.string()),
    }))


_ROWS = [
    ("a", 0, "user", "Bob works at Acme Corp."),
    ("a", 1, "assistant", "Alice mentioned Acme Corp."),
    ("b", 0, "user", "Alice mentioned search."),
    ("c", 0, "user", "Carol uses search daily."),
    ("d", 0, "user", "Alice mentioned Quokka Ventures."),
    # pronoun turn: the resolver side of the fused exchange must still
    # resolve 'She' against conv-a state with kindrec rows riding along
    ("a", 2, "user", "She works at Globex."),
]


def _multiset(ds):
    return sorted(tuple(r.get(k) for k in sorted(r)) for r in ds.take_all())


def test_fused_equals_separate_on_golden(ray_session):
    tds = _tds(_ROWS)
    triples_f, _events, rec_f = KR.extract_with_recovery(tds)
    assert _multiset(triples_f) == _multiset(X.extract_triples(_tds(_ROWS)))
    assert _multiset(rec_f) == _multiset(
        KR.recovered_triples(_tds(_ROWS)))


def test_fused_recovered_three_regimes(ray_session):
    _t, _e, rec = KR.extract_with_recovery(_tds(_ROWS))
    got = {(r["conv_id"], r["obj"]): r["obj_kind"] for r in rec.take_all()}
    assert got[("a", "Acme Corp")] == "org"     # round 1 (conv-local)
    assert got[("b", "search")] == "tool"       # round 2 (global)
    assert ("d", "Quokka Ventures") not in got  # round 0 stub dropped


def test_fused_equals_separate_on_synth_corpus(ray_session, sf_small):
    synth.ensure_corpus(sf_small)
    tp = synth.transcripts_path(sf_small)
    triples_f, _events, rec_f = KR.extract_with_recovery(
        ray.data.read_parquet(tp))
    assert _multiset(triples_f) == _multiset(
        X.extract_triples(ray.data.read_parquet(tp)))
    assert _multiset(rec_f) == _multiset(
        KR.recovered_triples(ray.data.read_parquet(tp)))


def test_build_graph_fused_flag_equivalence(ray_session, sf_small):
    """kg.build_graph(fused_recovery=True) produces the identical
    canonical-triple multiset — the flag only swaps the exchange plan
    (r4 A/B found the fusion slower at sf0.1 and reverted; the flag
    keeps it wired for scale-level A/Bs)."""
    from joern_ray.pipelines import kg

    synth.ensure_corpus(sf_small)
    tp = synth.transcripts_path(sf_small)

    def canon_multiset(fused):
        g = kg.build_graph(ray.data.read_parquet(tp), fused_recovery=fused)
        return _multiset(g["triples_canonical"])

    assert canon_multiset(True) == canon_multiset(False)
