"""Distributed extraction vs the serial oracle (P/R >= 0.95 gate)."""

import pyarrow as pa
import pyarrow.parquet as pq

from joern_ray import synth
from joern_ray.extract import oracle
from joern_ray.stages import extract as X


def _table_triples(t: pa.Table) -> set:
    return {(r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
            for r in t.to_pylist()}


def test_extract_events_vectorized_matches_oracle_without_pronouns():
    t, _ = synth.generate_corpus(48)
    ev = X.extract_events(t)
    # non-pronoun events must match oracle's non-pronoun triples exactly
    # fused untyped-mention OVERLAY events (obj_kind='unknown') are a
    # deliberate superset of the grammar — compared in test_kindrec.py
    got = {(r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
           for r in ev.to_pylist()
           if r["subj"] is not None and r["obj"] is not None
           and r["obj_kind"] != "unknown"}
    # the oracle's non-pronoun emissions, isolated robustly: run each turn
    # as its own conversation, so every pronoun slot is unresolvable and
    # drops — works for pronoun slots in ANY position (v8 coordination),
    # not just turn-initial pronouns
    want = {(d["conv_id"], d["turn_idx"], d["subj"], d["pred"], d["obj"])
            for r in t.to_pylist()
            for d in oracle.extract_conversation([r])}
    assert got == want


def test_full_extraction_pr_vs_oracle(ray_session, sf_small):
    import ray
    path = synth.transcripts_path(sf_small)
    ds = ray.data.read_parquet(path)
    triples = X.extract_triples(ds)
    got = _table_triples(pa.concat_tables(
        [b for b in triples.iter_batches(batch_format="pyarrow")]))

    rows = pq.read_table(path).to_pylist()
    want = {(d["conv_id"], d["turn_idx"], d["subj"], d["pred"], d["obj"])
            for d in oracle.extract_all(rows)}
    inter = len(got & want)
    precision = inter / max(1, len(got))
    recall = inter / max(1, len(want))
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # with a shared contract the two implementations should agree exactly
    assert got == want


def test_extraction_count_matches_ground_truth(ray_session, sf_small):
    import pyarrow.compute as pc

    import ray

    from joern_ray.functions import rules as R

    ds = ray.data.read_parquet(synth.transcripts_path(sf_small))
    n = X.extract_triples(ds).count()
    # GT also records the kind-recovery OVERLAY rows (pred='mentioned',
    # v10) — the surface grammar stream is compared against the grammar
    # subset only (the overlay is covered by the canonical P/R test and
    # test_kindrec.py)
    gt_t = pq.read_table(synth.gt_path(sf_small))
    gt = gt_t.filter(pc.not_equal(gt_t.column("pred"),
                                  R.MENTIONED_PRED)).num_rows
    assert n == gt


def test_redact_persons_masks_all_dictionary_names(ray_session, sf_small):
    """PII scrub: no known person surface survives in redacted text, and
    the per-turn count equals the number of replaced tokens."""
    import re

    from joern_ray.pipelines import text as T

    out = T.redact_persons(sf_small).to_pandas()
    # non-capturing group: Series.str.contains warns on capture groups
    pat = re.compile(T._person_pattern().replace("(", "(?:", 1))
    assert (out["n_redacted"] > 0).any()
    assert not out["redacted"].str.contains(pat).any()
    # count parity: redacting again is a no-op
    assert (out["redacted"].str.count(re.escape(T.REDACT_TOKEN))
            >= out["n_redacted"]).all()


def test_repetition_and_familiarity_integer_contracts(ray_session):
    """Gopher-style repetition + corpus-familiarity scores: integer
    permille/count contracts on a hand-built corpus (empty doc → zeros;
    all-same-token doc → distinct_pm floor(1000/n), top_tok_pm 1000;
    rarest-token count surfaces in freq_min)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    d = "/tmp/jr_textops_sf"
    os.makedirs(os.path.join(d), exist_ok=True)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["spark spark spark spark",      # pure repetition
                 "key value table",              # all distinct
                 "",                             # empty
                 "key key rareword"],            # one rare token
        "lang": ["en"] * 4,
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    rep = {r["doc_id"]: r for r in T.repetition_stats(d).take_all()}
    assert rep[0]["distinct_pm"] == 250 and rep[0]["top_tok_pm"] == 1000
    assert rep[1]["distinct_pm"] == 1000 and rep[1]["top_tok_pm"] == 333
    assert rep[2]["distinct_pm"] == 0 and rep[2]["top_tok_pm"] == 0
    fam = {r["doc_id"]: r for r in T.familiarity(d).take_all()}
    # global counts: spark=4, key=3, value=1, table=1, rareword=1
    assert fam[0]["freq_sum"] == 16 and fam[0]["freq_min"] == 4
    assert fam[1]["freq_sum"] == 5 and fam[1]["freq_min"] == 1
    assert fam[2]["freq_sum"] == 0 and fam[2]["freq_min"] == 0
    assert fam[3]["freq_sum"] == 7 and fam[3]["freq_min"] == 1


def test_familiarity_cogroup_equals_broadcast(ray_session):
    """The fully distributed (token-bucketed cogroup) familiarity path
    must equal the broadcast-vocabulary path row-for-row."""
    from joern_ray.pipelines import text as T

    sf = "/root/testdata/sf0.01"
    a = sorted(map(tuple, (r.values() for r in T.familiarity(sf).take_all())))
    b = sorted(map(tuple, (r.values()
                           for r in T.familiarity_cogroup(sf).take_all())))
    assert a == b and len(a) > 0


def test_decontaminate_drops_planted_benchmark_overlap(ray_session):
    """A training doc whose text equals a reference-slice doc must drop;
    distinct texts survive; reference docs never appear in the output."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    d = "/tmp/jr_decon_sf"
    os.makedirs(d, exist_ok=True)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 10, 11], pa.int64()),
        # doc_id % 10 == 0 → reference slice (ids 0 and 10)
        "text": ["benchmark question one", "clean doc",
                 "benchmark question one",      # contaminated (== doc 0)
                 "benchmark question two", "another clean doc"],
        "lang": ["en"] * 5,
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    kept = sorted(r["doc_id"] for r in T.decontaminate(d).take_all())
    assert kept == [1, 11]


def test_text_ops_null_text_contracts(ray_session):
    """NULL text must behave like empty text in every documents operator
    (the SQL mirrors' LEFT JOIN / NOT EXISTS semantics): zero scores from
    repetition/familiarity, survival through decontamination — never a
    silently dropped row or an all-NULL oracle."""
    import os

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    d = "/tmp/jr_nulltext_sf"
    os.makedirs(d, exist_ok=True)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 11], pa.int64()),
        "text": pa.array([None, "clean doc", "clean two", None],
                         pa.string()),
        "lang": ["en"] * 4,
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(d, 'documents.parquet')}')")

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(list(df.columns), kind="mergesort") \
                 .reset_index(drop=True)

    for fn, sql in ((T.repetition_stats, T.repetition_stats_sql()),
                    (T.familiarity, T.familiarity_sql()),
                    (T.decontaminate, T.decontaminate_sql())):
        got, want = norm(fn(d).to_pandas()), norm(con.sql(sql).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # cogroup path mirrors the broadcast path on NULL rows too
    a = sorted(map(tuple, (r.values() for r in T.familiarity(d).take_all())))
    b = sorted(map(tuple,
                   (r.values() for r in T.familiarity_cogroup(d).take_all())))
    assert a == b


def test_decontaminate_ngram_drops_embedded_overlap(ray_session):
    """The fuzzy scrub must catch contamination EMBEDDED in a longer
    training doc (which exact matching misses), must not drop docs with
    sub-n overlap, and must agree with its SQL oracle including on NULL
    and short (< n tokens) texts."""
    import os

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    d = "/tmp/jr_decon_ngram_sf"
    os.makedirs(d, exist_ok=True)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 11], pa.int64()),
        # doc_id % 10 == 0 → reference slice (id 0)
        "text": pa.array([
            "alpha beta gamma delta",              # reference doc (4-gram)
            "prefix alpha beta gamma delta suffix",  # embedded → drop
            "alpha beta gamma other words here",   # only a 3-gram → keep
            "totally different clean text doc",    # keep
            "tiny doc",                            # < n tokens → keep
            None,                                  # NULL text → keep
        ], pa.string()),
        "lang": ["en"] * 6,
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    kept = sorted(r["doc_id"] for r in
                  T.decontaminate_ngram(d).take_all())
    assert kept == [2, 3, 4, 11]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(d, 'documents.parquet')}')")
    want = sorted(con.sql(T.decontaminate_ngram_sql()).df()["doc_id"])
    assert kept == list(want)


def test_decontaminate_ngram_matches_oracle_at_sf001(ray_session):
    """Full-corpus agreement with the n-gram-STRING SQL oracle at sf0.01
    (hash-vs-string equivalence absent 64-bit collisions)."""
    import duckdb

    from joern_ray.pipelines import text as T

    sf = "/root/testdata/sf0.01"
    got = sorted(r["doc_id"] for r in T.decontaminate_ngram(sf).take_all())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    want = sorted(con.sql(T.decontaminate_ngram_sql()).df()["doc_id"])
    assert got == list(want) and len(got) > 0


def test_tfidf_topk_golden_and_cogroup_equivalence(ray_session):
    """Hand-checkable tf-idf golden: rare terms outrank common ones;
    ties break on token order; ranks are dense from 1; and the
    beyond-broadcast cogroup path emits the identical table."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    d = "/tmp/jr_tfidf_sf"
    os.makedirs(d, exist_ok=True)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        # N=4 docs; "common" in docs 0-2 (df=3, idf=4000//3=1333);
        # "rare" only in doc 0 (df=1, idf=4000)
        "text": ["rare common common common",
                 "common midA midA",      # midA df=2 → idf=2000
                 "common midA",
                 None],
        "lang": ["en"] * 4,
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    rows = sorted(map(tuple, (r.values() for r in
                              T.tfidf_topk(d).take_all())))
    # doc 0: rare 1*4000=4000 > common 3*1333=3999 (idf floor division)
    assert (0, 1, "rare", 4000) in rows
    assert (0, 2, "common", 3999) in rows
    # doc 1: midA 2*2000=4000 > common 1*1333
    assert (1, 1, "midA", 4000) in rows and (1, 2, "common", 1333) in rows
    # doc 2: midA 1*2000 > common 1*1333
    assert (2, 1, "midA", 2000) in rows and (2, 2, "common", 1333) in rows
    # null-text doc emits nothing
    assert not any(r[0] == 3 for r in rows)

    cg = sorted(map(tuple, (r.values() for r in
                            T.tfidf_topk_cogroup(d).take_all())))
    assert rows == cg


def test_tfidf_topk_cogroup_matches_broadcast_at_sf001(ray_session):
    from joern_ray.pipelines import text as T

    sf = "/root/testdata/sf0.01"
    a = sorted(map(tuple, (r.values() for r in
                           T.tfidf_topk(sf).take_all())))
    b = sorted(map(tuple, (r.values() for r in
                           T.tfidf_topk_cogroup(sf).take_all())))
    assert a == b and len(a) > 0


def test_source_mix_weights_golden(ray_session):
    """Integer-permille mixing weights: proportional to token mass, null
    text counts zero tokens but still one doc."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    d = "/tmp/jr_srcmix_sf"
    os.makedirs(d, exist_ok=True)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a b c", "d e", None, "f g h i j"], pa.string()),
        "lang": ["en"] * 4,
        "source": ["s0", "s0", "s1", "s1"],
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    out = {r["source"]: r for r in T.source_mix_weights(d).to_pylist()}
    # s0: 2 docs, 5 tokens; s1: 2 docs, 5 tokens (null → 0); total 10
    assert out["s0"]["n_docs"] == 2 and out["s0"]["n_tokens"] == 5
    assert out["s1"]["n_docs"] == 2 and out["s1"]["n_tokens"] == 5
    assert out["s0"]["weight_permille"] == 500
    assert out["s1"]["doc_share_permille"] == 500


def test_quality_classifier_separates_planted_vocab(ray_session):
    """Quality-classifier training on a corpus with a separable
    vocabulary: reference-slice docs (doc_id % 10 == 0) use 'good' words,
    others 'bad' words — the trained model must score the held-out-style
    docs on the correct side, and training must be deterministic."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    d = "/tmp/jr_qc_sf"
    os.makedirs(d, exist_ok=True)
    good = "curated encyclopedia article prose reference"
    bad = "spam click buy casino pills"
    docs = pa.table({
        "doc_id": pa.array(list(range(0, 200, 10))        # positives
                           + list(range(1, 100, 2)), pa.int64()),
        "text": [good] * 20 + [bad] * 50,
        "lang": ["en"] * 70,
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    w1 = T.train_quality_classifier(d, iters=30)
    w2 = T.train_quality_classifier(d, iters=30)
    assert np.array_equal(w1, w2)          # deterministic fold
    scores = {r["doc_id"]: r["qc_score"] for r in
              T.quality_classifier_scores(d, iters=30).take_all()}
    assert len(scores) == 70
    pos = [scores[i] for i in range(0, 200, 10)]
    neg = [scores[i] for i in range(1, 100, 2)]
    assert min(pos) > max(neg)             # perfectly separable vocab
    assert all(0.0 <= s <= 1.0 for s in scores.values())


def test_quality_classifier_matches_local_reference(ray_session):
    """Distributed full-batch gradient descent equals a single-process
    numpy implementation up to float fold-order noise (rtol 1e-9)."""
    import numpy as np
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    sf = "/root/testdata/sf0.001"
    w = T.train_quality_classifier(sf, iters=5)
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"]).sort_by("doc_id")
    X, ids = T._qc_features(t, T.QC_DIM)
    y = (ids % T.QC_REF_MOD == 0).astype(np.float64)
    w_ref = np.zeros(T.QC_DIM + 1)
    for _ in range(5):
        p = 1.0 / (1.0 + np.exp(-(X @ w_ref)))
        w_ref -= T.QC_LR * (X.T @ (p - y)) / len(ids)
    assert np.allclose(w, w_ref, rtol=1e-9, atol=1e-12)


def test_bpe_training_golden_and_encode_monotonicity():
    """Merge learning on a hand-built corpus: the most frequent adjacent
    pair merges first (lexicographic tie-break), training is
    deterministic, and more merges never increase a word's token count."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    d = "/tmp/jr_bpe_sf"
    os.makedirs(d, exist_ok=True)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["low low low low low", "lower lower newer", "new new"],
        "lang": ["en"] * 3,
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    m1 = T.train_bpe_merges(d, n_merges=10)
    m2 = T.train_bpe_merges(d, n_merges=10)
    assert m1 == m2
    # (l,o), (o,w) and (w,EOW) all count 7 (low x5, lower x2 for the
    # first two; low x5 + new x2 for the third): the lexicographic
    # tie-break picks ('w', EOW); (l,o) still counts 7 next round
    assert m1[0] == ("w", T.BPE_EOW)
    assert m1[1] == ("l", "o")
    ranks_few = {tuple(p): i for i, p in enumerate(m1[:2])}
    ranks_all = {tuple(p): i for i, p in enumerate(m1)}
    for w in ("low", "lower", "newer", "new", "unseen"):
        assert (T.bpe_encode_word(w, ranks_all)
                <= T.bpe_encode_word(w, ranks_few)
                <= len(w) + 1)
    # after enough merges the most frequent word is a single token
    assert T.bpe_encode_word("low", ranks_all) == 1


def test_bpe_token_counts_match_serial_reference(ray_session):
    """Distributed actor-pool apply == serial per-doc encode with the
    same merge list, incl. null/empty-text docs counting zero."""
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in
           T.bpe_token_counts(sf).take_all()}
    merges = T.train_bpe_merges(sf)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    want = {}
    for did, s in zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()):
        words = (s or "").split()
        want[did] = sum(T.bpe_encode_word(w, ranks) for w in words)
    assert got == want and len(got) > 0


def test_top_tokens_deterministic_tiebreak(ray_session):
    """Heavy hitters: counts and the (count DESC, token ASC) tie-break
    are exact on a hand-built corpus."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from joern_ray.pipelines import text as T

    d = "/tmp/jr_toptok_sf"
    os.makedirs(d, exist_ok=True)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["b a b c", "a b c", None],
        "lang": ["en"] * 3,
    })
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    out = [(r["token"], r["n"]) for r in T.top_tokens(d, k=2).to_pylist()]
    assert out == [("b", 3), ("a", 2)]
