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


N_PLANES = 8
# multiprobe radius: buckets within this hamming distance of the query's
# bucket are scanned.  3 of 8 bits ≈ 37% of vectors on uniform data (≈2.7x
# pruning) — chosen from a measured recall/candidates sweep (recall≈0.7 on
# the synthetic embeddings, which have little cluster structure; clustered
# real data prunes far harder at the same radius).
HAM_RADIUS = 3
PLANES_SEED = 77


def _planes(dim: int) -> np.ndarray:
    """Hyperplanes from a FIXED per-call seed: every invocation (in any
    order, any session) derives the identical LSH geometry — a shared
    module-level generator would make results depend on call order."""
    return np.random.default_rng(PLANES_SEED).standard_normal((dim, N_PLANES))


def ann_lsh(sf_dir: str, *, dim: int = 64):
    """LSH-bucketed ANN (scale path): random-hyperplane sign buckets prune
    candidates; exact cosine only within the query's bucket ring."""
    planes = _planes(dim)
    qids, qmat = _query_matrix(sf_dir)
    qsig = (qmat @ planes) > 0
    qbuckets = {int(q): int(sig.dot(1 << np.arange(N_PLANES)))
                for q, sig in zip(qids, qsig)}
    qref = ray.put((qids, qmat, qbuckets))
    pref = ray.put(planes)
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        qids_, qmat_, qb = ray.get(qref)
        planes_ = ray.get(pref)
        vecs = _norm_rows(_matrix(t))
        sig = ((vecs @ planes_) > 0).dot(1 << np.arange(N_PLANES)).astype(int)
        vec_ids = t.column("vec_id").to_numpy()
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            qbucket = qb[int(qids_[qi])]
            ham = np.array([bin(int(s) ^ qbucket).count("1") for s in sig])
            cand = np.nonzero(ham <= HAM_RADIUS)[0]
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


def embedding_neardup(sf_dir: str, *, threshold: float = 0.95):
    """Embedding-cosine near-duplicate pairs via sign-LSH blocking."""
    planes = _planes(64)
    pref = ray.put(planes)
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])

    def bucket(t: pa.Table) -> pa.Table:
        planes_ = ray.get(pref)
        vecs = _norm_rows(_matrix(t))
        sig = ((vecs @ planes_) > 0).dot(1 << np.arange(N_PLANES)).astype(np.int64)
        return pa.table({"bucket": pa.array(sig, pa.int64()),
                         "vec_id": t.column("vec_id"),
                         "embedding": t.column("embedding")})

    def pairs(group: pa.Table) -> pa.Table:
        g = group.sort_by("vec_id")
        if g.num_rows > 256:
            g = g.slice(0, 256)  # bucket cap (bail-out guard)
        vecs = _norm_rows(_matrix(g))
        ids = g.column("vec_id").to_numpy()
        sims = vecs @ vecs.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        return pa.table({"a": pa.array(ids[ii], pa.int64()),
                         "b": pa.array(ids[jj], pa.int64()),
                         "sim": pa.array(sims[ii, jj], pa.float64())})

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("sim", pa.float64())])
    result = (ds.map_batches(bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(pairs, batch_format="pyarrow"))
    # union a typed empty block so a no-near-dup corpus still yields a
    # stable schema downstream
    return result.union(ray.data.from_arrow(out_schema.empty_table()))


KMEANS_K = 8
KMEANS_ITERS = 8


def kmeans(sf_dir: str, *, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Distributed Lloyd's k-means over the embedding column — the
    bounded-iteration fixed-point pattern (SURVEY §2.10): per-batch
    assignment + per-cluster partial (sum, count) combiners stream through
    the cluster; the driver folds only k×n_blocks tiny partials per round
    (sorted canonically so float accumulation order — hence the result —
    is deterministic).  Init = embeddings of the k smallest vec_ids.
    Returns (vec_id, cluster) assignments."""
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

    cref = ray.put(centroids)

    def final_assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        vecs = _matrix(t)
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pa.table({"vec_id": t.column("vec_id"),
                         "cluster": pa.array(d.argmin(axis=1), pa.int64())})

    return ds.map_batches(final_assign, batch_format="pyarrow")


N_PLANT = 50
PLANT_OFFSET = 1_000_000


def embedding_neardup_planted(sf_dir: str, *, threshold: float = 0.95):
    """Near-dup detection demonstrated on the input augmented with planted
    exact duplicates (vec_id < N_PLANT copied to vec_id + PLANT_OFFSET).

    The raw synthetic embeddings carry no pairs above any sane threshold
    (max off-diagonal cosine ≈0.51), so the un-augmented operator
    (``embedding_neardup``) can only ever prove "found nothing".  Planting
    exact copies makes recall provable: an exact copy shares every LSH
    sign-bucket with its original, so blocking cannot miss it, and the pair
    set equals the exact all-pairs oracle (`embedding_neardup_planted_sql`).
    Output is (a, b) pairs only — similarity values would differ in float
    rounding between numpy float64 and DuckDB's float32 kernels."""
    planes = _planes(64)
    pref = ray.put(planes)
    ds = ray.data.read_parquet(_p(sf_dir), columns=["vec_id", "embedding"])

    def augment(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
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

    def bucket(t: pa.Table) -> pa.Table:
        planes_ = ray.get(pref)
        vecs = _norm_rows(_matrix(t))
        sig = ((vecs @ planes_) > 0).dot(1 << np.arange(N_PLANES)).astype(np.int64)
        return pa.table({"bucket": pa.array(sig, pa.int64()),
                         "vec_id": t.column("vec_id"),
                         "embedding": t.column("embedding")})

    def pairs(group: pa.Table) -> pa.Table:
        g = group.sort_by("vec_id")
        vecs = _norm_rows(_matrix(g))
        ids = g.column("vec_id").to_numpy()
        sims = vecs @ vecs.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        return pa.table({"a": pa.array(ids[ii], pa.int64()),
                         "b": pa.array(ids[jj], pa.int64())})

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    result = (ds.map_batches(augment, batch_format="pyarrow")
              .map_batches(bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(pairs, batch_format="pyarrow"))
    return result.union(ray.data.from_arrow(out_schema.empty_table()))


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
