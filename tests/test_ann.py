"""ANN: LSH variant recall vs exact brute force; near-dup invariants."""

import numpy as np

from joern_ray.pipelines import ann as A

SF = "/root/testdata/sf0.01"


def test_lsh_recall_vs_bruteforce(ray_session):
    exact = A.ann_bruteforce(SF).to_pandas()
    approx = A.ann_lsh(SF).to_pandas()
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    # bucket-ring pruning trades recall for candidate count (radius tuned
    # by a measured sweep; see ann.HAM_RADIUS); the query vector itself
    # (sim=1) must always survive
    assert np.mean(recalls) >= 0.5, recalls
    for q in exact["query_id"].unique():
        assert q in set(approx[approx["query_id"] == q]["vec_id"]), \
            "query vector must be its own neighbor"


def test_neardup_pairs_are_symmetric_free_and_thresholded(ray_session):
    df = A.embedding_neardup(SF, threshold=0.8).to_pandas()
    if len(df) == 0:
        return  # corpus has no near-dups at this threshold — fine
    assert (df["a"] < df["b"]).all()       # canonical orientation, no dups
    assert (df["sim"] >= 0.8).all()


def test_simhash_batch_lockstep_with_scalar(ray_session):
    import pyarrow as pa
    from joern_ray.pipelines import text as T

    texts = ["the quick brown fox", "the quick brown fox",
             "the quick brown cat", "completely different words here",
             "", "single"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = T.simhash_batch(t).column("simhash").to_pylist()
    want = [T.simhash64(s) for s in texts]
    assert got == want


def test_minhash_planted_clusters(ray_session):
    """Planted near-dup docs: identical + one-word-swap docs must cluster;
    unrelated docs must not (exact golden, VERDICT item 7)."""
    import pyarrow as pa
    import ray.data
    from joern_ray.pipelines import text as T

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    near = base.replace("theta", "thetaX")  # high shingle overlap
    docs = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [base, base, near,
                 "one two three four five six seven eight nine ten",
                 "unrelated totally different text with no overlap at all"],
    })
    out = T.minhash_clusters(ray.data.from_arrow(docs).repartition(2),
                             threshold=0.5).take_all()
    cl = {r["doc_id"]: r["cluster"] for r in out}
    assert len(cl) == 5
    assert cl[1] == cl[2] == cl[3] == "1"   # min-doc-id label
    assert cl[4] != cl[1] and cl[5] != cl[1] and cl[4] != cl[5]


def test_simhash_clusters_planted(ray_session, tmp_path):
    """simhash banding finds hamming-close planted duplicates."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from joern_ray.pipelines import text as T

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": [base, base,
                 "entirely different content with other words present"],
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = T.simhash_clusters(str(tmp_path)).take_all()
    cl = {r["doc_id"]: r["cluster"] for r in out}
    assert cl[1] == cl[2] == "1"
    assert cl[3] != cl[1]


def test_ann_lsh_self_recall_and_determinism(ray_session):
    """Each query's own vector shares every LSH bucket with itself, so
    rank-1 must be the query itself; repeated runs are identical (fixed
    hyperplane seed regardless of call order)."""
    from joern_ray.pipelines import ann as A

    sf = "/root/testdata/sf0.001"
    out1 = sorted(map(tuple, (r.values() for r in A.ann_lsh(sf).take_all())))
    out2 = sorted(map(tuple, (r.values() for r in A.ann_lsh(sf).take_all())))
    assert out1 == out2
    rank1 = {q: v for q, r, v in out1 if r == 1}
    assert all(rank1[q] == q for q in rank1)
    assert len(rank1) == A.N_QUERIES


def test_dedup_minhash_driver_equals_distributed(ray_session):
    from joern_ray.pipelines import text as T

    sf = "/root/testdata/sf0.001"
    fast = sorted((r["doc_id"], r["cluster"]) for r in
                  T.dedup_minhash(sf, distributed=False).take_all())
    slow = sorted((r["doc_id"], r["cluster"]) for r in
                  T.dedup_minhash(sf, distributed=True).take_all())
    assert fast == slow and len(fast) > 0


def test_kmeans_deterministic_and_partitions(ray_session):
    from collections import Counter

    from joern_ray.pipelines import ann as A

    sf = "/root/testdata/sf0.001"
    a = sorted((r["vec_id"], r["cluster"])
               for r in A.kmeans(sf, k=4, iters=4).take_all())
    b = sorted((r["vec_id"], r["cluster"])
               for r in A.kmeans(sf, k=4, iters=4).take_all())
    assert a == b                         # deterministic across runs
    labels = Counter(c for _, c in a)
    assert set(labels) <= set(range(4)) and len(labels) >= 2
    assert sum(labels.values()) == len(a)


def test_kmeans_planted_clusters(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from joern_ray.pipelines import ann as A

    rng = np.random.default_rng(5)
    c0 = rng.normal(0, 0.05, (20, 8)) + np.array([10.0] + [0] * 7)
    c1 = rng.normal(0, 0.05, (20, 8)) + np.array([-10.0] + [0] * 7)
    vecs = np.vstack([c0, c1])
    t = pa.table({"vec_id": list(range(40)),
                  "embedding": [v.astype(np.float32).tolist() for v in vecs]})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    out = {r["vec_id"]: r["cluster"]
           for r in A.kmeans(str(tmp_path), k=2, iters=6).take_all()}
    g0 = {out[i] for i in range(20)}
    g1 = {out[i] for i in range(20, 40)}
    assert len(g0) == 1 and len(g1) == 1 and g0 != g1


def test_model_scores_deterministic(ray_session):
    from joern_ray.pipelines import text as T

    sf = "/root/testdata/sf0.001"
    a = sorted((r["doc_id"], r["model_score"])
               for r in T.model_scores(sf).take_all())
    b = sorted((r["doc_id"], r["model_score"])
               for r in T.model_scores(sf).take_all())
    assert a == b and len(a) > 0
    assert all(0.0 <= s <= 1.0 for _, s in a)


def test_ann_ivf_self_retrieval_and_recall(ray_session):
    from joern_ray.pipelines.ann import (TOP_K, ann_bruteforce, ann_ivf,
                                         IVF_NLIST, IVF_NPROBE)
    sf = "/root/testdata/sf0.001"
    ivf = ann_ivf(sf).take_all()
    # probe metric == assignment metric ⇒ a query that exists in the
    # corpus always probes its own list: rank-1 self match, sim ≈ 1
    by_q = {}
    for r in ivf:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q, "no IVF results"
    for q, rows in by_q.items():
        top = min(rows, key=lambda r: r["rank"])
        assert top["vec_id"] == q and abs(top["sim"] - 1.0) < 1e-9
    # recall@k vs brute force is at least ballpark nprobe/nlist on
    # structureless data (use half as a safe floor)
    bf = ann_bruteforce(sf).take_all()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for q, want in bf_sets.items():
        got = {r["vec_id"] for r in by_q.get(q, [])}
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.5 * IVF_NPROBE / IVF_NLIST


def test_ann_ivf_deterministic(ray_session):
    from joern_ray.pipelines.ann import ann_ivf
    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, (r.values() for r in ann_ivf(sf).take_all())))
    b = sorted(map(tuple, (r.values() for r in ann_ivf(sf).take_all())))
    assert a == b


def test_dedup_semantic_planted_matches_exact_oracle(ray_session):
    """SemDeDup on the planted corpus equals the clustering-free exact
    greedy min-id rule (SQL oracle): every planted copy drops, every
    original survives."""
    import duckdb

    from joern_ray.pipelines import ann as A

    sf = "/root/testdata/sf0.01"
    kept = sorted(r["vec_id"] for r in
                  A.dedup_semantic_planted(sf).take_all())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf}/embeddings.parquet')")
    want = sorted(con.sql(A.dedup_semantic_planted_sql()).df()["vec_id"])
    assert kept == list(want)
    assert not any(v >= A.PLANT_OFFSET for v in kept)   # copies dropped
    assert len(kept) > 0


def test_dedup_semantic_chunked_slab_is_boundary_exact(ray_session,
                                                       monkeypatch):
    """Forcing a tiny sim-slab chunk must not change the kept set — the
    chunk boundary math (strictly-smaller-id mask) is exact."""
    from joern_ray.pipelines import ann as A

    sf = "/root/testdata/sf0.01"
    base = sorted(r["vec_id"] for r in
                  A.dedup_semantic_planted(sf).take_all())
    monkeypatch.setattr(A, "_SEMDEDUP_CHUNK", 7)
    tiny = sorted(r["vec_id"] for r in
                  A.dedup_semantic_planted(sf).take_all())
    assert base == tiny


def test_dedup_semantic_raw_keeps_everything_below_threshold(ray_session):
    """The raw synthetic embeddings have no cosine >= 0.95 pair, so the
    un-planted operator keeps every vec_id."""
    import pyarrow.parquet as pq

    from joern_ray.pipelines import ann as A

    sf = "/root/testdata/sf0.01"
    n = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id"]).num_rows
    kept = A.dedup_semantic(sf).count()
    assert kept == n


def test_matrix_fast_path_equals_pylist_on_ragged_and_null():
    """_matrix's zero-copy fixed-dim reshape must agree with the pylist
    path, including through a non-zero-offset slice."""
    import numpy as np
    import pyarrow as pa

    from joern_ray.pipelines import ann as A

    fixed = pa.table({"embedding": pa.array(
        [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], pa.list_(pa.float32()))})
    m = A._matrix(fixed)
    assert m.shape == (3, 2) and m.dtype == np.float64
    assert np.array_equal(
        m, np.asarray([[1, 2], [3, 4], [5, 6]], dtype=np.float64))
    # sliced view (non-zero offset) still correct
    m2 = A._matrix(fixed.slice(1, 2))
    assert np.array_equal(m2, np.asarray([[3, 4], [5, 6]], np.float64))


def test_ann_pq_equals_reconstruction_bruteforce(ray_session):
    """ADC distance over the subspace partition equals exact L2 to the
    RECONSTRUCTED vector, so PQ top-k must equal brute force over locally
    decoded vectors — an exact equivalence, not a recall bound.  Also
    checks determinism across runs."""
    import numpy as np
    import pyarrow.parquet as pq

    from joern_ray.pipelines import ann as A

    sf = "/root/testdata/sf0.01"
    got = [(r["query_id"], r["rank"], r["vec_id"])
           for r in A.ann_pq(sf).take_all()]
    got2 = [(r["query_id"], r["rank"], r["vec_id"])
            for r in A.ann_pq(sf).take_all()]
    assert sorted(got) == sorted(got2)          # deterministic

    books = A._pq_codebooks(sf, A.PQ_M, A.PQ_K, A.PQ_ITERS)
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).sort_by("vec_id")
    X = A._matrix(t)
    ids = t.column("vec_id").to_numpy()
    sub = X.shape[1] // A.PQ_M
    recon = np.empty_like(X)
    for j in range(A.PQ_M):
        S = X[:, j * sub:(j + 1) * sub]
        codes = ((S[:, None, :] - books[j][None, :, :]) ** 2) \
            .sum(axis=2).argmin(axis=1)
        recon[:, j * sub:(j + 1) * sub] = books[j][codes]
    qmask = ids < A.N_QUERIES
    want = []
    for qi, q in zip(ids[qmask], X[qmask]):
        d = ((recon - q) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))[:A.TOP_K]
        want.extend((int(qi), r + 1, int(ids[i]))
                    for r, i in enumerate(order))
    assert sorted(got) == sorted(want)


def test_embedding_pca_matches_local_numpy(ray_session):
    """Distributed two-pass PCA equals a single-process numpy fit
    (canonical folds + sign normalization), runs are identical, and
    projected variance is non-increasing across components."""
    import numpy as np
    import pyarrow.parquet as pq

    from joern_ray.pipelines import ann as A

    sf = "/root/testdata/sf0.001"
    m1, c1 = A._pca_model(sf, 8)
    m2, c2 = A._pca_model(sf, 8)
    assert np.array_equal(m1, m2) and np.array_equal(c1, c2)

    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).sort_by("vec_id")
    X = A._matrix(t)
    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / (len(X) - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:8]
    comps = vecs[:, order].T
    flip = np.sign(comps[np.arange(8), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    assert np.allclose(m1, mean, rtol=1e-9)
    assert np.allclose(c1, comps, rtol=1e-6, atol=1e-9)

    proj = {r["vec_id"]: r["proj"] for r in A.embedding_pca(sf).take_all()}
    P = np.asarray([proj[i] for i in sorted(proj)])
    v = P.var(axis=0)
    assert all(v[i] >= v[i + 1] - 1e-9 for i in range(len(v) - 1))
    assert np.allclose(P, (X - mean) @ comps.T, rtol=1e-6, atol=1e-9)
