"""Character-n-gram Jaccard pairs: planted golden + exact-value lockstep."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import pytest

from joern_ray.pipelines.text import (NGRAM_K, _char_ngram_hashes,
                                      ngram_jaccard_exact,
                                      ngram_jaccard_pairs)


def _mk_corpus(tmp_path):
    """50 clearly-distinct docs + 5 planted near-identical pairs
    (one-character edits, char-trigram Jaccard > 0.9)."""
    rng = np.random.default_rng(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    texts, ids = [], []
    for i in range(50):
        texts.append(" ".join(rng.choice(words, size=12).tolist())
                     + f" uniq{i:03d}")
        ids.append(i)
    planted = []
    for j in range(5):
        base = texts[j]
        edited = base[:10] + "X" + base[11:]   # one-char substitution
        ids.append(100 + j)
        texts.append(edited)
        planted.append((j, 100 + j))
    d = tmp_path / "sfX"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(d / "documents.parquet"))
    return str(d), planted, dict(zip(ids, texts))


def test_ngram_planted_pairs_found(ray_session, tmp_path):
    sf, planted, by_id = _mk_corpus(tmp_path)
    rows = ngram_jaccard_pairs(sf, threshold=0.8).take_all()
    got = {(r["a"], r["b"]) for r in rows}
    assert set(planted) <= got
    # every reported pair's score matches the naive reference and clears
    # the threshold; no pair of distinct base docs sneaks in
    for r in rows:
        want = ngram_jaccard_exact(by_id[r["a"]], by_id[r["b"]])
        assert abs(r["jaccard"] - want) < 1e-12
        assert r["jaccard"] >= 0.8
        assert not (r["a"] < 50 and r["b"] < 50)


@pytest.mark.parametrize("a,b", [
    ("hello world", "hello world"),
    ("hello world", "hellX world"),
    ("abc", "xyz"),
    ("", ""),
    ("a", "ab"),
    ("the same prefix then different tails 1111",
     "the same prefix then different tails 2222"),
])
def test_ngram_hashed_equals_naive(a, b):
    x = _char_ngram_hashes(a)
    y = _char_ngram_hashes(b)
    inter = np.intersect1d(x, y, assume_unique=True).size
    denom = x.size + y.size - inter
    j_hashed = inter / denom if denom else 1.0
    assert abs(j_hashed - ngram_jaccard_exact(a, b)) < 1e-12
    assert NGRAM_K == 3
