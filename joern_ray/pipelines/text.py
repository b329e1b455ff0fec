"""Text-analysis + deduplication pack over the ``documents`` table.

Large-scale training-data pipeline operators: token counting, quality
signals, language-ID heuristic, document fingerprinting, exact dedup,
MinHash-LSH / SimHash / n-gram-Jaccard near-dup.  All per-document signals
are vectorized Arrow kernels; near-dup blocking reuses the engine's LSH
machinery (joern_ray.functions.hashing).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

from ..functions import hashing as H

_STOPWORD_RE = r"\b(the|a|of|and)\b"
_WS_RE = r"\s+"


def _p(sf_dir: str, table: str = "documents") -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _tidy(ds):
    return ds.repartition(4)


# ---------------------------------------------------------------------------
# per-document signals (SQL-checkable: integer/string outputs only)
# ---------------------------------------------------------------------------

def text_stats(sf_dir: str):
    """doc_id → token count, char count, stopword hits, digit chars."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t.column("text")
        trimmed = pc.utf8_trim_whitespace(text)
        seps = pc.count_substring_regex(trimmed, _WS_RE)
        n_tokens = pc.if_else(pc.equal(trimmed, ""), 0, pc.add(seps, 1))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": n_tokens.cast(pa.int64()),
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
            "stop_hits": pc.count_substring_regex(text, _STOPWORD_RE).cast(pa.int64()),
            "digit_chars": pc.count_substring_regex(text, r"[0-9]").cast(pa.int64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def text_stats_sql() -> str:
    return r"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS stop_hits,
           len(regexp_extract_all(text, '[0-9]')) AS digit_chars
    FROM documents
    """


def lang_id(sf_dir: str):
    """Deterministic stopword-density language heuristic (the rule, not the
    label column — both sides of the oracle compute the same rule)."""
    stats = text_stats(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        dense = pc.greater_equal(pc.multiply(t.column("stop_hits"), 8),
                                 t.column("n_tokens"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang_pred": pc.if_else(dense, "en", "other"),
        })
    return stats.map_batches(fn, batch_format="pyarrow")


def lang_id_sql() -> str:
    return r"""
    SELECT doc_id,
           CASE WHEN len(regexp_extract_all(text, '\b(the|a|of|and)\b')) * 8
                     >= CASE WHEN trim(text) = '' THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                THEN 'en' ELSE 'other' END AS lang_pred
    FROM documents
    """


def token_counts(sf_dir: str):
    """(doc_id, token, n) — exploded token counts, fully vectorized:
    split_pattern → list lengths → parent indices → flatten, then a local
    Arrow group_by per batch (no Python loop over rows)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        mask = pc.not_equal(trimmed, "")
        sub = t.filter(mask)
        trimmed = pc.utf8_trim_whitespace(sub.column("text"))
        toks = pc.split_pattern_regex(trimmed, _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parents = np.repeat(sub.column("doc_id").to_numpy(), lengths)
        flat = pc.list_flatten(toks)
        return (pa.table({"doc_id": pa.array(parents, pa.int64()),
                          "token": flat})
                .group_by(["doc_id", "token"])
                .aggregate([("token", "count")])
                .rename_columns(["doc_id", "token", "n"]))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def token_counts_sql() -> str:
    return r"""
    SELECT doc_id, token, count(*) AS n FROM (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents WHERE trim(text) <> '')
    GROUP BY 1, 2
    """


def text_quality(sf_dir: str):
    """Composite quality signals in integer permille (deterministic under
    any execution order, unlike float ratios): digit density, stopword
    density, plus a 0-3 rule score."""
    stats = text_stats(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        n_tok = t.column("n_tokens")
        n_chars = t.column("n_chars")
        digit_pm = pc.if_else(
            pc.equal(n_chars, 0), 0,
            pc.divide(pc.multiply(t.column("digit_chars"), 1000), n_chars))
        stop_pm = pc.if_else(
            pc.equal(n_tok, 0), 0,
            pc.divide(pc.multiply(t.column("stop_hits"), 1000), n_tok))
        score = pc.add(
            pc.add(
                pc.cast(pc.and_(pc.greater_equal(n_tok, 5),
                                pc.less_equal(n_tok, 1000)), pa.int64()),
                pc.cast(pc.less(digit_pm, 300), pa.int64())),
            pc.cast(pc.greater(stop_pm, 50), pa.int64()))
        return pa.table({"doc_id": t.column("doc_id"),
                         "digit_pm": pc.cast(digit_pm, pa.int64()),
                         "stop_pm": pc.cast(stop_pm, pa.int64()),
                         "quality": score})
    return stats.map_batches(fn, batch_format="pyarrow")


def text_quality_sql() -> str:
    return r"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS n_tokens,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS stop_hits,
             len(regexp_extract_all(text, '[0-9]')) AS digit_chars
      FROM documents)
    SELECT doc_id,
           CASE WHEN n_chars = 0 THEN 0
                ELSE digit_chars * 1000 // n_chars END AS digit_pm,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE stop_hits * 1000 // n_tokens END AS stop_pm,
           (CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 1 ELSE 0 END
            + CASE WHEN (CASE WHEN n_chars = 0 THEN 0
                         ELSE digit_chars * 1000 // n_chars END) < 300
                   THEN 1 ELSE 0 END
            + CASE WHEN (CASE WHEN n_tokens = 0 THEN 0
                         ELSE stop_hits * 1000 // n_tokens END) > 50
                   THEN 1 ELSE 0 END)::BIGINT AS quality
    FROM s
    """


HASH_DIM = 256


def hashed_vectors(sf_dir: str, *, dim: int = HASH_DIM):
    """Feature-hashed bag-of-words counts per document — the
    EmbeddingGenerator analog (``joern-cli/.../JoernVectors.scala:98-120``:
    substructure counts keyed by MurmurHash), emitted sparse as
    (doc_id, bucket, n).  Hashing = deterministic pandas hash_array
    (vectorized), bucket = hash % dim."""
    import pandas as pd

    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t.column("text"))
        sub = t.filter(pc.not_equal(trimmed, ""))
        trimmed = pc.utf8_trim_whitespace(sub.column("text"))
        toks = pc.split_pattern_regex(trimmed, _WS_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parents = np.repeat(sub.column("doc_id").to_numpy(), lengths)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        buckets = (pd.util.hash_array(flat) % dim).astype("int64")
        return (pa.table({"doc_id": pa.array(parents, pa.int64()),
                          "bucket": pa.array(buckets, pa.int64())})
                .group_by(["doc_id", "bucket"])
                .aggregate([("bucket", "count")])
                .rename_columns(["doc_id", "bucket", "n"]))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def doc_fingerprint(sf_dir: str):
    """Content fingerprint (md5 — matches DuckDB's md5() for the oracle)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "fp": pa.array(fps, pa.string())})
    return ds.map_batches(fn, batch_format="pyarrow")


def doc_fingerprint_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp FROM documents"


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

def dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition on text, keep min doc_id per group
    (groupby.first discipline, ``FileCreationPass`` get-or-create analog)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    return _tidy(ds.groupby("text")
                 .aggregate(Min(on="doc_id", alias_name="doc_id"),
                            Count(alias_name="n_copies"))
                 .map_batches(lambda t: (t.select(["doc_id", "n_copies"])
                                         if t.num_columns else
                                         pa.schema([("doc_id", pa.int64()),
                                                    ("n_copies", pa.int64())]).empty_table()),
                              batch_format="pyarrow"))


def dedup_exact_sql() -> str:
    return """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """


def _word_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


LSH_DOC_BUCKET_CAP = 64


def _shingle_hashes(text: str) -> np.ndarray:
    """Sorted unique 64-bit hashes of the word shingles — Jaccard on these
    equals Jaccard on the shingles (collisions negligible), and the narrow
    int arrays travel with the shuffle instead of the full text."""
    return np.unique(H.hash_strings(_word_shingles(text)))


def minhash_clusters(docs_ds: "ray.data.Dataset", *, threshold: float = 0.8):
    """MinHash+LSH near-duplicate clusters over (doc_id, text).

    shingle → minhash → band → bucket-groupby → in-bucket exact-Jaccard
    verification (bucket rows carry the doc's shingle-hash array, so no
    text ever enters the shuffle and no driver-side side table exists) →
    min-doc-id cluster labels via the engine's union-find."""
    from ..stages.cc import connected_components

    def keys(t: pa.Table) -> pa.Table:
        ids, buckets, hashes = [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            hs = _shingle_hashes(text)
            sig = H.minhash_from_hashes(hs)
            hl = hs.astype(np.int64).tolist()
            for bk in H.band_keys(sig):
                ids.append(did)
                buckets.append(bk)
                hashes.append(hl)
        return pa.table({"bucket": pa.array(buckets, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "hashes": pa.array(hashes,
                                            pa.list_(pa.int64()))})

    _EMPTY_PAIRS = pa.schema([("a", pa.string()),
                              ("b", pa.string())]).empty_table()

    def pairs(group: pa.Table) -> pa.Table:
        # fast path: almost every bucket is a singleton — skip pandas
        if group.num_rows < 2 or \
                pc.count_distinct(group.column("doc_id")).as_py() < 2:
            return _EMPTY_PAIRS
        df = group.to_pandas().drop_duplicates("doc_id") \
            .sort_values("doc_id").head(LSH_DOC_BUCKET_CAP)
        ids = df["doc_id"].tolist()
        hs = [np.asarray(h, dtype=np.int64) for h in df["hashes"]]
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = np.intersect1d(hs[i], hs[j],
                                       assume_unique=True).size
                denom = hs[i].size + hs[j].size - inter
                if denom and inter / denom >= threshold:
                    a.append(str(ids[i]))
                    b.append(str(ids[j]))
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string())})

    # same verified pair can surface from several bands → exact dedup
    edges = (docs_ds.map_batches(keys, batch_format="pyarrow")
             .groupby("bucket").map_groups(pairs, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Count(alias_name="nb"))
             .map_batches(lambda t: (t.select(["a", "b"]) if t.num_columns
                                     else pa.schema([("a", pa.string()),
                                                     ("b", pa.string())]).empty_table()),
                          batch_format="pyarrow")
             .repartition(4))
    nodes = docs_ds.map_batches(
        lambda t: pa.table({"node": pc.cast(t.column("doc_id"), pa.string())}),
        batch_format="pyarrow")
    labels = connected_components(edges, nodes)
    return labels.map_batches(
        lambda t: (pa.table({"doc_id": pc.cast(t.column("node"), pa.int64()),
                             "cluster": pc.cast(t.column("label"), pa.string())})
                   if t.num_columns else
                   pa.schema([("doc_id", pa.int64()),
                              ("cluster", pa.string())]).empty_table()),
        batch_format="pyarrow")


def dedup_minhash(sf_dir: str):
    docs = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    return minhash_clusters(docs)


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (deterministic blake2 basis)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in set(text.split()):
        h = np.uint64(int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"))
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= (1 << i)
    return out - (1 << 63)


def dedup_simhash(sf_dir: str):
    """doc_id → simhash (near-dups share close hamming distance)."""
    ds = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        hs = [simhash64(s) for s in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "simhash": pa.array(hs, pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow")


def ngram_jaccard_pairs(sf_dir: str, *, threshold: float = 0.5):
    """All-pairs n-gram Jaccard above threshold via LSH blocking (never the
    quadratic driver loop)."""
    docs = ray.data.read_parquet(_p(sf_dir), columns=["doc_id", "text"])
    clusters = minhash_clusters(docs, threshold=threshold)
    # pairs = co-clustered docs (already verified >= threshold on an edge
    # path; report cluster membership as the dedup decision)
    return clusters
