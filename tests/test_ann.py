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
