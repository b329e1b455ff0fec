"""Similarity search over the ``embeddings`` table (list<float> column).

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (`ray.put` once, zero-copy numpy view per batch).
Scale path: LSH-bucketed variant (random-hyperplane signs) that prunes the
candidate set before exact scoring.  Embedding near-dup detection reuses the
same kernel with a similarity threshold.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

TOP_K = 10
N_QUERIES = 5


def _p(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def _matrix(t: pa.Table) -> np.ndarray:
    col = t.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy().astype(np.int64)
    widths = offs[1:] - offs[:-1]
    if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
        # fixed-dim fast path: one flat zero-copy view + reshape
        flat = col.values.to_numpy(zero_copy_only=False)
        return flat[offs[0]:offs[-1]].astype(np.float64).reshape(
            len(widths), int(widths[0]))
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    # row-group/pushdown filter at the read: only the N_QUERIES rows leave
    # storage (a driver-side full-table load would not survive 100 TB)
    t = pq.read_table(_p(sf_dir), columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", N_QUERIES)])
    t = t.sort_by("vec_id")
    return (t.column("vec_id").to_numpy(), _norm_rows(_matrix(t)))


def ann_bruteforce(sf_dir: str):
    """(query_id, rank, vec_id) exact cosine top-k per query vector.

    Per-batch scores stream through a per-query groupby that keeps only the
    local top-k per batch first (combiner) so the global exchange carries
    k·n_batches rows, not the full score matrix.
    """
    qids, qmat = _query_matrix(sf_dir)
    qref = ray.put((qids, qmat))
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        qids_, qmat_ = ray.get(qref)
        vecs = _norm_rows(_matrix(t))
        sims = vecs @ qmat_.T  # (n, q)
        vec_ids = t.column("vec_id").to_numpy()
        out_q, out_v, out_s = [], [], []
        k = min(TOP_K, len(vec_ids))
        for qi in range(len(qids_)):
            s = sims[:, qi]
            # local top-k combiner (argpartition, then exact order later)
            idx = np.argpartition(-s, k - 1)[:k] if len(s) > k else np.arange(len(s))
            out_q.extend([int(qids_[qi])] * len(idx))
            out_v.extend(vec_ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    def topk(group: pa.Table) -> pa.Table:
        g = group.sort_by([("sim", "descending"), ("vec_id", "ascending")])
        g = g.slice(0, TOP_K)
        n = g.num_rows
        return pa.table({"query_id": g.column("query_id"),
                         "rank": pa.array(range(1, n + 1), pa.int64()),
                         "vec_id": g.column("vec_id")})

    scores = ds.map_batches(score, batch_format="pyarrow")
    return scores.groupby("query_id").map_groups(topk, batch_format="pyarrow")


def ann_bruteforce_sql() -> str:
    return f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < {N_QUERIES})
    SELECT query_id, rank, vec_id FROM (
      SELECT q.qid AS query_id, e.vec_id,
             row_number() OVER (
               PARTITION BY q.qid
               ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                        e.vec_id) AS rank
      FROM q CROSS JOIN embeddings e) t
    WHERE rank <= {TOP_K}
    """


N_PLANES = 16
# multiprobe radius: buckets within this hamming distance of the query's
# 16-bit bucket are scanned.  Measured recall/candidates sweep on sf0.01
# (structureless synthetic embeddings — clustered real data prunes far
# harder at the same radius):
#   radius 5: recall@10 0.42 @ 10.9% candidates
#   radius 6: recall@10 0.66 @ 22.6%   <- chosen (old 8-plane design:
#   radius 7: recall@10 0.88 @ 40.4%      0.70 @ 37%)
# 2^16 buckets ⇒ at 10^9 vectors a bucket holds ~15k docs, and
# radius-probing is per-QUERY work, so bucket occupancy no longer caps
# recall the way the old 2^8 space did.
HAM_RADIUS = 6
PLANES_SEED = 77

# 16-bit popcount lookup (module-level, built once per process)
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                  dtype=np.int8)


def _planes(dim: int, n_planes: int = N_PLANES,
            seed: int = PLANES_SEED) -> np.ndarray:
    """Hyperplanes from a FIXED per-call seed: every invocation (in any
    order, any session) derives the identical LSH geometry — a shared
    module-level generator would make results depend on call order."""
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def _sign_buckets(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """int64 bucket per row = packed sign bits of vecs @ planes."""
    bits = (vecs @ planes) > 0
    return bits.dot(1 << np.arange(planes.shape[1])).astype(np.int64)


def ann_lsh(sf_dir: str, *, dim: int = 64):
    """LSH-bucketed ANN (scale path): random-hyperplane sign buckets prune
    candidates; exact cosine only within the query's hamming-radius ring.
    Hamming distances are one vectorized xor + popcount-table gather per
    (batch, query) — no Python loop over rows."""
    planes = _planes(dim)
    qids, qmat = _query_matrix(sf_dir)
    qbuckets = _sign_buckets(qmat, planes)
    qref = ray.put((qids, qmat, qbuckets))
    pref = ray.put(planes)
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        qids_, qmat_, qb = ray.get(qref)
        planes_ = ray.get(pref)
        vecs = _norm_rows(_matrix(t))
        sig = _sign_buckets(vecs, planes_)
        vec_ids = t.column("vec_id").to_numpy()
        out_q, out_v, out_s = [], [], []
        ham_all = _POP16[np.bitwise_xor(sig[:, None], qb[None, :])]
        for qi in range(len(qids_)):
            cand = np.nonzero(ham_all[:, qi] <= HAM_RADIUS)[0]
            if len(cand) == 0:
                continue
            s = vecs[cand] @ qmat_[qi]
            out_q.extend([int(qids_[qi])] * len(cand))
            out_v.extend(vec_ids[cand].tolist())
            out_s.extend(s.tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    def topk(group: pa.Table) -> pa.Table:
        g = group.sort_by([("sim", "descending"), ("vec_id", "ascending")])
        g = g.slice(0, TOP_K)
        return pa.table({"query_id": g.column("query_id"),
                         "rank": pa.array(range(1, g.num_rows + 1), pa.int64()),
                         "vec_id": g.column("vec_id")})

    return (ds.map_batches(score, batch_format="pyarrow")
            .groupby("query_id").map_groups(topk, batch_format="pyarrow"))


N_VEC_BANDS = 16
NEARDUP_BUCKET_CAP = 256


def _band_planes(dim: int) -> np.ndarray:
    return _planes(dim, N_VEC_BANDS * N_PLANES, PLANES_SEED)


def _neardup_pairs(ds: "ray.data.Dataset", *, threshold: float,
                   with_sim: bool, dim: int = 64, n_buckets: int = 256):
    """Banded sign-LSH near-dup blocking + exact cosine verification.

    The round-2 design used ONE 8-bit bucket (recall at cos 0.95 ≈ 0.43,
    and 256 total buckets ⇒ corpus-scale caps destroy recall).  Now the
    signature is 16 BANDS × 16 planes OR-composed MinHash-style: a pair is
    a candidate if ANY band matches.  Per-plane agreement at cos ≥ 0.95 is
    p = 1 - acos(0.95)/π ≈ 0.90 ⇒ band match p¹⁶ ≈ 0.18, any-of-16 ⇒
    blocking recall ≈ 0.96; exact duplicates agree on every band by
    construction.  Bucket space per band is 2^16 (bucket key carries the
    band id), buckets are capped at NEARDUP_BUCKET_CAP (deterministic
    sorted prefix — at 10^9 vectors a band bucket averages ~15k docs, so
    the cap trades tail recall for bounded n² work; raise bands, not the
    cap, to recover it).  Band rows carry (bucket, vec_id) only — 16 B;
    embeddings attach to surviving candidate pairs via two bucketed
    cogroup joins (the minhash-chain discipline), with cross-band pair
    dedup riding the first join."""
    from .text import _mh_attach_hashes

    planes = _band_planes(dim)
    pref = ray.put(planes)
    weights = (1 << np.arange(N_PLANES)).astype(np.int64)

    def band_rows(t: pa.Table) -> pa.Table:
        planes_ = ray.get(pref)
        vecs = _norm_rows(_matrix(t))
        bits = (vecs @ planes_) > 0
        n = len(vecs)
        buckets = np.empty((n, N_VEC_BANDS), np.int64)
        for b in range(N_VEC_BANDS):
            buckets[:, b] = (
                bits[:, b * N_PLANES:(b + 1) * N_PLANES] @ weights
                | (b << N_PLANES))
        ids = np.repeat(t.column("vec_id").to_numpy(), N_VEC_BANDS)
        return pa.table({"bucket": pa.array(buckets.ravel(), pa.int64()),
                         "vec_id": pa.array(ids, pa.int64())})

    _EMPTY_PAIRS = pa.schema([("a", pa.int64()),
                              ("b", pa.int64())]).empty_table()

    def cand_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return _EMPTY_PAIRS
        ids = sorted(set(group.column("vec_id").to_pylist()))
        ids = ids[:NEARDUP_BUCKET_CAP]     # deterministic bail-out cap
        a = [x for i, x in enumerate(ids) for _ in ids[i + 1:]]
        b = [y for i, x in enumerate(ids) for y in ids[i + 1:]]
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    cand = (ds.map_batches(band_rows, batch_format="pyarrow")
            .groupby("bucket").map_groups(cand_pairs,
                                          batch_format="pyarrow"))
    emb = ds.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("vec_id").cast(pa.int64()),
            "vec": t.column("embedding").cast(pa.list_(pa.float64()))}),
        batch_format="pyarrow").materialize()
    vt = pa.list_(pa.float64())
    with_a = _mh_attach_hashes(
        cand, emb, "a", [("a", pa.int64()), ("b", pa.int64())], "va",
        n_buckets=n_buckets, dedupe=True, val_col="vec", val_type=vt)
    with_ab = _mh_attach_hashes(
        with_a, emb, "b",
        [("a", pa.int64()), ("b", pa.int64()), ("va", vt)], "vb",
        n_buckets=n_buckets, dedupe=False, val_col="vec", val_type=vt)

    fields = [("a", pa.int64()), ("b", pa.int64())]
    if with_sim:
        fields.append(("sim", pa.float64()))
    out_schema = pa.schema(fields)

    def _mat(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
        # list<float64> → (n, dim) with ONE flatten + reshape (embedding
        # columns are fixed-dim) — no per-row to_pylist round-trip
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), -1)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        va = _norm_rows(_mat(t.column("va")))
        vb = _norm_rows(_mat(t.column("vb")))
        sims = (va * vb).sum(axis=1)
        keep = sims >= threshold
        cols = {"a": t.column("a").filter(pa.array(keep)),
                "b": t.column("b").filter(pa.array(keep))}
        if with_sim:
            cols["sim"] = pa.array(sims[keep], pa.float64())
        return pa.table(cols)

    return (with_ab.map_batches(verify, batch_format="pyarrow")
            .union(ray.data.from_arrow(out_schema.empty_table())))


def embedding_neardup(sf_dir: str, *, threshold: float = 0.95):
    """Embedding-cosine near-duplicate pairs via banded sign-LSH."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])
    return _neardup_pairs(ds, threshold=threshold, with_sim=True)


KMEANS_K = 8
KMEANS_ITERS = 8


def _kmeans_centroids(sf_dir: str, k: int, iters: int) -> np.ndarray:
    """Bounded Lloyd's over the embedding column → (k, dim) centroids —
    the bounded-iteration fixed-point pattern (SURVEY §2.10): per-batch
    assignment + per-cluster partial (sum, count) combiners stream through
    the cluster; the driver folds only k×n_blocks tiny partials per round
    (sorted canonically so float accumulation order — hence the result —
    is deterministic).  Init = embeddings of the k smallest vec_ids."""
    import pyarrow.parquet as pq

    seedt = pq.read_table(_p(sf_dir), columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", k)]).sort_by("vec_id")
    centroids = _matrix(seedt)
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])

    def assign_partial(t: pa.Table, cref) -> pa.Table:
        cents = ray.get(cref)
        vecs = _matrix(t)
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        rows_c, sums, counts = [], [], []
        for c in range(len(cents)):
            m = lab == c
            if not m.any():
                continue
            rows_c.append(c)
            sums.append(vecs[m].sum(axis=0).tolist())
            counts.append(int(m.sum()))
        return pa.table({"cluster": pa.array(rows_c, pa.int64()),
                         "vsum": pa.array(sums, pa.list_(pa.float64())),
                         "n": pa.array(counts, pa.int64())})

    for _ in range(iters):
        cref = ray.put(centroids)
        parts = (ds.map_batches(lambda t, _r=cref: assign_partial(t, _r),
                                batch_format="pyarrow").take_all())
        # canonical fold order => deterministic float accumulation
        parts.sort(key=lambda r: (r["cluster"], r["n"], tuple(r["vsum"])))
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids))
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["vsum"])
            counts[r["cluster"]] += r["n"]
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def kmeans(sf_dir: str, *, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Distributed Lloyd's k-means: (vec_id, cluster) assignments (see
    ``_kmeans_centroids`` for the iteration shape)."""
    centroids = _kmeans_centroids(sf_dir, k, iters)
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])
    cref = ray.put(centroids)

    def final_assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        vecs = _matrix(t)
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pa.table({"vec_id": t.column("vec_id"),
                         "cluster": pa.array(d.argmin(axis=1), pa.int64())})

    return ds.map_batches(final_assign, batch_format="pyarrow")


IVF_NLIST = 64
IVF_NPROBE = 8


def ann_ivf(sf_dir: str, *, nlist: int = IVF_NLIST,
            nprobe: int = IVF_NPROBE, iters: int = KMEANS_ITERS):
    """IVF ANN — the coarse-quantizer scale path (FAISS IVF-flat shape):
    Lloyd's centroids partition the corpus into ``nlist`` inverted lists;
    each query probes its ``nprobe`` nearest lists and scores exact cosine
    only against their members.

    Distribution shape: centroids train via the streaming partial-combine
    loop (tiny driver fold), then ONE broadcast of (centroids, queries,
    probe mask) serves every batch — a batch computes its rows' list
    assignment with one matmul and masks rows against each query's probe
    set; the exchange carries only local top-k rows per (query, batch).
    Probe selection uses the same (euclidean) metric as assignment, so a
    query vector that exists in the corpus always probes its own list —
    self-retrieval is exact by construction (pytest-asserted).  Expected
    recall on structureless data ≈ nprobe/nlist; clustered real data
    concentrates neighbors into the probed lists."""
    cents = _kmeans_centroids(sf_dir, nlist, iters)
    import pyarrow.parquet as pq
    qt = pq.read_table(_p(sf_dir), columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", N_QUERIES)]).sort_by("vec_id")
    qids = qt.column("vec_id").to_numpy()
    qraw = _matrix(qt)
    qmat = _norm_rows(qraw)
    qd = ((qraw[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :nprobe]          # (q, nprobe)
    pmask = np.zeros((len(cents), len(qids)), dtype=bool)
    for qi in range(len(qids)):
        pmask[probes[qi], qi] = True
    ref = ray.put((cents, qids, qmat, pmask))
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        cents_, qids_, qmat_, pm = ray.get(ref)
        raw = _matrix(t)
        lab = ((raw[:, None, :] - cents_[None, :, :]) ** 2).sum(
            axis=2).argmin(axis=1)
        vecs = _norm_rows(raw)
        vec_ids = t.column("vec_id").to_numpy()
        cand_mask = pm[lab]                              # (n, q)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            cand = np.nonzero(cand_mask[:, qi])[0]
            if len(cand) == 0:
                continue
            s = vecs[cand] @ qmat_[qi]
            k = min(TOP_K, len(cand))
            idx = (np.argpartition(-s, k - 1)[:k] if len(s) > k
                   else np.arange(len(s)))
            out_q.extend([int(qids_[qi])] * len(idx))
            out_v.extend(vec_ids[cand[idx]].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    def topk(group: pa.Table) -> pa.Table:
        g = group.sort_by([("sim", "descending"), ("vec_id", "ascending")])
        g = g.slice(0, TOP_K)
        n = g.num_rows
        return pa.table({"query_id": g.column("query_id"),
                         "rank": pa.array(range(1, n + 1), pa.int64()),
                         "vec_id": g.column("vec_id"),
                         "sim": g.column("sim")})

    return (ds.map_batches(score, batch_format="pyarrow")
            .groupby("query_id").map_groups(topk, batch_format="pyarrow"))


PCA_COMPONENTS = 8


def _pca_model(sf_dir: str, c: int) -> tuple[np.ndarray, np.ndarray]:
    """Distributed PCA fit: (mean, components) via two streaming passes —
    pass 1 folds per-batch (sum, n) partials, pass 2 folds per-batch
    centered scatter matrices (dim x dim, tiny: 64^2 floats per block);
    both folds run in canonical order so the model is deterministic.
    Eigenvectors are sign-normalized (largest-|entry| coordinate made
    positive) so the orientation is library-independent."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])

    def sum_partial(t: pa.Table) -> pa.Table:
        m = _matrix(t)
        return pa.table({"s": pa.array([m.sum(axis=0).tolist()],
                                       pa.list_(pa.float64())),
                         "n": pa.array([len(m)], pa.int64())})

    parts = ds.map_batches(sum_partial, batch_format="pyarrow").take_all()
    parts.sort(key=lambda r: (r["n"], tuple(r["s"])))
    total = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    n = sum(r["n"] for r in parts)
    mean = total / max(n, 1)
    mref = ray.put(mean)

    def scatter_partial(t: pa.Table, _m=mref) -> pa.Table:
        x = _matrix(t) - ray.get(_m)
        s = x.T @ x
        return pa.table({"s": pa.array([s.ravel().tolist()],
                                       pa.list_(pa.float64())),
                         "n": pa.array([len(x)], pa.int64())})

    parts = (ds.map_batches(scatter_partial, batch_format="pyarrow")
             .take_all())
    parts.sort(key=lambda r: (r["n"], tuple(r["s"])))
    d = len(mean)
    cov = np.sum([np.asarray(r["s"]).reshape(d, d) for r in parts],
                 axis=0) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:c]
    comps = vecs[:, order].T                     # (c, dim)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return mean, comps


def embedding_pca(sf_dir: str, *, components: int = PCA_COMPONENTS):
    """PCA dimensionality reduction over the embedding column — the
    pre-ANN compression stage: (vec_id, proj list<float64> of length
    ``components``).  Model fits via two bounded streaming folds
    (`_pca_model`); projection is one broadcast + matmul per batch.
    Rows-only (eigendecomposition has no SQL mirror); determinism and
    local-numpy equivalence are pytest-enforced."""
    mean, comps = _pca_model(sf_dir, components)
    ref = ray.put((mean, comps))
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])

    def project(t: pa.Table) -> pa.Table:
        m_, c_ = ray.get(ref)
        p = (_matrix(t) - m_) @ c_.T
        return pa.table({"vec_id": t.column("vec_id").cast(pa.int64()),
                         "proj": pa.array(p.tolist(),
                                          pa.list_(pa.float64()))})

    return ds.map_batches(project, batch_format="pyarrow")


PQ_M = 8          # subspaces (one uint8 code each → 8 B per vector)
PQ_K = 16         # centroids per subspace codebook
PQ_ITERS = 8
PQ_TRAIN_N = 2048  # codebooks train on this bounded vec_id-prefix sample


def _pq_codebooks(sf_dir: str, m: int, k: int, iters: int) -> np.ndarray:
    """Product-quantization codebooks: per-subspace Lloyd's over a BOUNDED
    deterministic sample (vec_id < PQ_TRAIN_N via parquet pushdown — the
    standard practice: codebooks are trained on a sample, applied to the
    full corpus).  Deterministic: fixed vec_id order, first-k init, fixed
    iteration count.  Returns (m, k, dim/m)."""
    import pyarrow.parquet as pq

    t = pq.read_table(_p(sf_dir), columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", PQ_TRAIN_N)]
                      ).sort_by("vec_id")
    X = _matrix(t)
    n, d = X.shape
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by PQ_M={m}")
    if n < k:
        raise ValueError(f"PQ training sample ({n}) smaller than k={k}")
    sub = d // m
    books = np.empty((m, k, sub), np.float64)
    for j in range(m):
        S = X[:, j * sub:(j + 1) * sub]
        C = S[:k].copy()
        for _ in range(iters):
            dmat = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            lab = dmat.argmin(axis=1)
            for c in range(k):
                msk = lab == c
                if msk.any():
                    C[c] = S[msk].mean(axis=0)
        books[j] = C
    return books


def ann_pq(sf_dir: str, *, m: int = PQ_M, k: int = PQ_K,
           iters: int = PQ_ITERS):
    """Product-quantization ANN (Jégou et al. 2011, the FAISS PQ shape):
    every corpus vector compresses to ``m`` uint8 codes (8 B vs 512 B
    float64 = 64x — the memory-bound 100-TB index path); queries scan via
    ADC lookup tables.  For L2 over the subspace partition, ADC distance
    EQUALS the exact distance to the RECONSTRUCTED (decoded) vector —
    pytest asserts that equivalence against a local reconstruction.

    Distribution shape: codebooks train once on a bounded sample and
    broadcast with the query LUTs via ONE ``ray.put``; each batch encodes
    itself (m argmin matmuls) and emits only its local top-k rows per
    query; one query-keyed groupby finishes the fold."""
    books = _pq_codebooks(sf_dir, m, k, iters)
    import pyarrow.parquet as pq

    qt = pq.read_table(_p(sf_dir), columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", N_QUERIES)]
                       ).sort_by("vec_id")
    qids = qt.column("vec_id").to_numpy()
    qraw = _matrix(qt)
    sub = qraw.shape[1] // m
    # ADC lookup tables: lut[qi, j, c] = ||q_sub - codebook[j, c]||^2
    lut = np.empty((len(qids), m, k), np.float64)
    for j in range(m):
        qs = qraw[:, j * sub:(j + 1) * sub]
        lut[:, j, :] = ((qs[:, None, :] - books[j][None, :, :]) ** 2) \
            .sum(axis=2)
    ref = ray.put((books, qids, lut))

    def score(t: pa.Table) -> pa.Table:
        books_, qids_, lut_ = ray.get(ref)
        X = _matrix(t)
        n = len(X)
        sub_ = X.shape[1] // len(books_)
        vec_ids = t.column("vec_id").to_numpy()
        dists = np.zeros((len(qids_), n), np.float64)
        for j in range(len(books_)):
            S = X[:, j * sub_:(j + 1) * sub_]
            codes = ((S[:, None, :] - books_[j][None, :, :]) ** 2) \
                .sum(axis=2).argmin(axis=1)            # (n,)
            dists += lut_[:, j, codes]                 # (Q, n)
        out_q, out_v, out_d = [], [], []
        for qi in range(len(qids_)):
            kk = min(TOP_K, n)
            idx = (np.argpartition(dists[qi], kk - 1)[:kk] if n > kk
                   else np.arange(n))
            out_q.extend([int(qids_[qi])] * len(idx))
            out_v.extend(vec_ids[idx].tolist())
            out_d.extend(dists[qi][idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "dist": pa.array(out_d, pa.float64())})

    def topk(group: pa.Table) -> pa.Table:
        g = group.sort_by([("dist", "ascending"), ("vec_id", "ascending")])
        g = g.slice(0, TOP_K)
        return pa.table({"query_id": g.column("query_id"),
                         "rank": pa.array(range(1, g.num_rows + 1),
                                          pa.int64()),
                         "vec_id": g.column("vec_id"),
                         "dist": g.column("dist")})

    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])
    return (ds.map_batches(score, batch_format="pyarrow")
            .groupby("query_id").map_groups(topk, batch_format="pyarrow"))


N_PLANT = 50
PLANT_OFFSET = 1_000_000


def embedding_neardup_planted(sf_dir: str, *, threshold: float = 0.95):
    """Near-dup detection demonstrated on the input augmented with planted
    exact duplicates (vec_id < N_PLANT copied to vec_id + PLANT_OFFSET).

    The raw synthetic embeddings carry no pairs above any sane threshold
    (max off-diagonal cosine ≈0.51), so the un-augmented operator
    (``embedding_neardup``) can only ever prove "found nothing".  Planting
    exact copies makes recall provable: an exact copy agrees with its
    original on EVERY band of the sign signature, so banded blocking
    cannot miss it (and at sf scales the capped buckets hold ~n/2^16 ≪
    cap docs, so the cap provably never binds), and the pair set equals
    the exact all-pairs oracle (`embedding_neardup_planted_sql`).  Output
    is (a, b) pairs only — similarity values would differ in float
    rounding between numpy float64 and DuckDB's float32 kernels."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])
    return _neardup_pairs(_augment_with_plants(ds),
                          threshold=threshold, with_sim=False)


def embedding_neardup_planted_sql(*, threshold: float = 0.95) -> str:
    return f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {PLANT_OFFSET}, embedding FROM embeddings
      WHERE vec_id < {N_PLANT})
    SELECT a.vec_id AS a, b.vec_id AS b
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {threshold}
    """


SEMDEDUP_THRESHOLD = 0.95
SEMDEDUP_CLUSTER_CAP = 100_000   # per-cluster row bound; see dedup_semantic
_SEMDEDUP_CHUNK = 1_024          # bounds the chunked sim-matrix slab to
#                                  cap x chunk x 8 B  (~800 MB at the cap)


def _augment_with_plants(ds):
    """Plant exact duplicates (vec_id < N_PLANT copied to
    vec_id + PLANT_OFFSET) — shared by the *_planted operators."""
    def augment(t: pa.Table) -> pa.Table:
        if t.num_rows and pc.max(t.column("vec_id")).as_py() >= PLANT_OFFSET:
            raise ValueError(
                "embeddings vec_id overlaps PLANT_OFFSET — raise the "
                "offset before planting duplicates on this corpus")
        keep = t.filter(pc.less(t.column("vec_id"), N_PLANT))
        if keep.num_rows == 0:
            return t
        dup = keep.set_column(
            keep.schema.get_field_index("vec_id"), "vec_id",
            pc.add(keep.column("vec_id"), PLANT_OFFSET))
        return pa.concat_tables([t, dup])
    return ds.map_batches(augment, batch_format="pyarrow")


def _semantic_keep(ds, sf_dir: str, *, k: int, iters: int,
                   threshold: float):
    """SemDeDup core (Abbas et al. 2023): Lloyd's k-means partitions the
    corpus; WITHIN each cluster the deterministic keep rule drops ``v``
    iff any smaller-id ``u`` in the cluster has cosine(u, v) >= threshold
    (the greedy min-id rule — a total order replaces the paper's
    farthest-from-centroid tiebreak so the result is reproducible and
    SQL-mirrorable).

    100-TB shape: centroids train via the streaming partial-combine loop
    (driver folds k x n_blocks tiny rows per round) and broadcast ONCE;
    assignment is one matmul per batch; the only exchange ships
    (cluster, vec_id, embedding) rows hash-bucketed by cluster.  The
    per-cluster work is O(c^2) dot products BY DESIGN (that is SemDeDup's
    trade: choose k ~ n / target_cluster_size so c stays bounded — the
    paper uses ~1e4-1e5 per cluster); the sim slab is CHUNKED so memory
    is cap x chunk, never c x c.  Clusters beyond SEMDEDUP_CLUSTER_CAP
    raise with that guidance rather than silently degrading."""
    cents = _kmeans_centroids(sf_dir, k, iters)
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        cents_ = ray.get(cref)
        vecs = _matrix(t)
        d = ((vecs[:, None, :] - cents_[None, :, :]) ** 2).sum(axis=2)
        return t.append_column("cluster",
                               pa.array(d.argmin(axis=1), pa.int64()))

    def dedup_group(g: pa.Table) -> pa.Table:
        if g.num_rows > SEMDEDUP_CLUSTER_CAP:
            raise ValueError(
                f"SemDeDup cluster of {g.num_rows} rows exceeds "
                f"SEMDEDUP_CLUSTER_CAP={SEMDEDUP_CLUSTER_CAP}; raise k "
                "(clusters shrink ~n/k) instead of lifting the cap")
        g = g.sort_by("vec_id")
        vecs = _norm_rows(_matrix(g))
        n = len(vecs)
        drop = np.zeros(n, bool)
        for a in range(1, n, _SEMDEDUP_CHUNK):
            b = min(a + _SEMDEDUP_CHUNK, n)
            sims = vecs[:b] @ vecs[a:b].T            # (b, b-a)
            # smaller-id-only mask: row index i strictly below column id
            earlier = (np.arange(b)[:, None]
                       < (a + np.arange(b - a))[None, :])
            drop[a:b] = ((sims >= threshold) & earlier).any(axis=0)
        return pa.table({"vec_id": g.column("vec_id").filter(
            pa.array(~drop))})

    out_schema = pa.schema([("vec_id", pa.int64())])
    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(dedup_group, batch_format="pyarrow")
            .union(ray.data.from_arrow(out_schema.empty_table())))


def dedup_semantic(sf_dir: str, *, k: int = KMEANS_K,
                   iters: int = KMEANS_ITERS,
                   threshold: float = SEMDEDUP_THRESHOLD):
    """Semantic deduplication over the embedding column (SemDeDup):
    kept vec_ids after within-cluster cosine pruning.  Approximate by
    construction — a near-dup pair split across clusters is not pruned;
    the planted variant (`dedup_semantic_planted`) is the provable one."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])
    return _semantic_keep(ds, sf_dir, k=k, iters=iters, threshold=threshold)


def dedup_semantic_planted(sf_dir: str, *, k: int = KMEANS_K,
                           iters: int = KMEANS_ITERS,
                           threshold: float = SEMDEDUP_THRESHOLD):
    """SemDeDup demonstrated on the planted-duplicate corpus, where the
    clustering step is provably lossless: an exact copy has identical
    centroid distances to its original, so argmin assigns both to the
    SAME cluster and the within-cluster rule must see the pair.  The raw
    synthetic embeddings carry no cosine >= 0.95 pairs (max off-diagonal
    ~0.51), so the kept set exactly equals the exhaustive greedy min-id
    rule over ALL pairs — the SQL oracle (`dedup_semantic_planted_sql`),
    which needs no clustering at all."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])
    return _semantic_keep(_augment_with_plants(ds), sf_dir,
                          k=k, iters=iters, threshold=threshold)


def dedup_semantic_planted_sql(*, threshold: float = SEMDEDUP_THRESHOLD
                               ) -> str:
    return f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {PLANT_OFFSET}, embedding FROM embeddings
      WHERE vec_id < {N_PLANT})
    SELECT v.vec_id FROM aug v
    WHERE NOT EXISTS (
      SELECT 1 FROM aug u WHERE u.vec_id < v.vec_id
        AND list_cosine_similarity(u.embedding, v.embedding)
            >= {threshold})
    """


# ---------------------------------------------------------------------------
# Semantic benchmark decontamination — the embedding-space member of the
# decontamination trio (text.decontaminate = exact-text scrub,
# text.decontaminate_ngram = GPT-3-style fuzzy n-gram scrub, this =
# paraphrase-robust cosine scrub).  Reference set = the vectors with
# ``vec_id < SEMDECON_N_REF`` (the benchmark's own embeddings — MB-scale
# by nature, same broadcast argument as text.decontaminate); a training
# vector is contaminated when its max cosine against ANY reference
# vector reaches SEMDECON_THRESHOLD.  The training stream never
# shuffles: one matmul per batch against the broadcast reference
# matrix, rejected rows simply drop out map-side.
# ---------------------------------------------------------------------------

SEMDECON_N_REF = 32
SEMDECON_MAX_REF = 1_000_000   # count-gated BEFORE any driver collect
# Chosen with real margin on the synthetic tables: the max training-vs-
# reference cosine distribution tops out ~0.49 with ~5% of rows above
# 0.35 and no observed sim within 1e-3 of the cut — float last-ulp
# divergence between numpy and DuckDB cannot flip a row (the ann_topk
# precedent: both sides compute double cosine on identical inputs).
SEMDECON_THRESHOLD = 0.35


def embedding_decontaminate(sf_dir: str, *, n_ref: int = SEMDECON_N_REF,
                            threshold: float = SEMDECON_THRESHOLD):
    """(vec_id, label) training rows surviving the semantic scrub."""
    import pyarrow.parquet as pq

    # pushdown filter at the read: only the reference rows leave storage
    rt = pq.read_table(_p(sf_dir), columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", n_ref)])
    if rt.num_rows > SEMDECON_MAX_REF:
        raise ValueError(
            f"reference slice has {rt.num_rows} rows "
            f"(> SEMDECON_MAX_REF={SEMDECON_MAX_REF}); a benchmark this "
            "size needs the banded-cogroup path, not a broadcast")
    rmat = _norm_rows(_matrix(rt)) if rt.num_rows else None
    rref = ray.put(rmat)
    ds = ray.data.read_parquet(_p(sf_dir),
                               columns=["vec_id", "embedding", "label"])

    def scrub(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.greater_equal(t.column("vec_id"),
                                        pa.scalar(n_ref, pa.int64())))
        out = sub.select(["vec_id", "label"])
        if sub.num_rows == 0:
            return out
        rmat_ = ray.get(rref)
        if rmat_ is None:
            return out
        vecs = _norm_rows(_matrix(sub))
        mx = (vecs @ rmat_.T).max(axis=1)
        return out.filter(pa.array(mx < threshold))

    return ds.map_batches(scrub, batch_format="pyarrow")


def embedding_decontaminate_sql(*, n_ref: int = SEMDECON_N_REF,
                                threshold: float = SEMDECON_THRESHOLD
                                ) -> str:
    return f"""
    SELECT e.vec_id, e.label FROM embeddings e
    WHERE e.vec_id >= {n_ref} AND NOT EXISTS (
      SELECT 1 FROM embeddings r WHERE r.vec_id < {n_ref}
        AND list_cosine_similarity(r.embedding, e.embedding)
            >= {threshold})
    """
