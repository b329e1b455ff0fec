"""Deterministic hashing utilities (ids, MinHash, content fingerprints).

Reference analogs: SHA-256 file-set hashing (``x2cpg/utils/HashUtil.scala:8-28``)
and MurmurHash3 feature hashing (``joern-cli/.../JoernVectors.scala:109``).
All hashes here are seed-stable (blake2b, not Python ``hash``) so results are
identical across workers, processes and runs.
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE_P = (1 << 61) - 1
N_PERMS = 32
N_BANDS = 8
ROWS_PER_BAND = N_PERMS // N_BANDS

_rng = np.random.default_rng(1234)
_A = _rng.integers(1, MERSENNE_P, size=N_PERMS, dtype=np.int64).astype(np.uint64)
_B = _rng.integers(0, MERSENNE_P, size=N_PERMS, dtype=np.int64).astype(np.uint64)


def blake2_id(key: str, size: int = 8) -> str:
    """Deterministic node/entity id: blake2b hex digest of a canonical key
    (the FULL_NAME discipline — no autoincrement/KeyPool coordination)."""
    return hashlib.blake2b(key.encode("utf-8"), digest_size=size).hexdigest()


def shingle_hash(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def hash_strings(strings) -> np.ndarray:
    """Vectorized deterministic 64-bit hashes (pandas siphash, fixed key —
    identical across workers/processes)."""
    import pandas as pd
    arr = np.asarray(list(strings), dtype=object)
    if arr.size == 0:
        return np.array([], dtype=np.uint64)
    return pd.util.hash_array(arr)


def minhash_from_hashes(hs: np.ndarray) -> np.ndarray:
    """N_PERMS MinHash values from pre-hashed shingles (uint64)."""
    if hs.size == 0:
        return np.zeros(N_PERMS, dtype=np.uint64)
    # (a*h + b) mod p, all perms at once: (n_shingles, n_perms)
    vals = (hs[:, None] * _A[None, :] + _B[None, :]) % np.uint64(MERSENNE_P)
    return vals.min(axis=0)


def minhash_signature(shingles: set[str]) -> np.ndarray:
    """N_PERMS MinHash values for a shingle set (uint64)."""
    return minhash_from_hashes(hash_strings(shingles))


def band_keys(sig: np.ndarray) -> list[str]:
    """LSH band bucket keys for one signature."""
    out = []
    for b in range(N_BANDS):
        chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
        h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
        out.append(f"{b}:{h}")
    return out
