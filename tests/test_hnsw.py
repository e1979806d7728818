"""Native HNSW index: build, recall vs exact, incremental add."""
import numpy as np
import pytest

from nafp_tpu.native.hnsw import HNSWIndex


def _unit(rng, n, d=64):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_hnsw_builds_and_searches(rng):
    db = _unit(rng, 3000)
    idx = HNSWIndex(d=64, m=16, ef_construction=80)
    idx.add(db)
    assert idx.ntotal == 3000
    q = db[[5, 77, 2999]] + 0.01 * rng.standard_normal((3, 64)).astype(np.float32)
    scores, ids = idx.search(q, k=5, ef_search=64)
    assert ids.shape == (3, 5)
    np.testing.assert_array_equal(ids[:, 0], [5, 77, 2999])
    # scores descending inner products
    assert (np.diff(scores, axis=1) <= 1e-5).all()


def test_hnsw_recall_vs_exact(rng):
    db = _unit(rng, 8000)
    idx = HNSWIndex(d=64, m=16, ef_construction=80)
    idx.add(db)
    q = db[rng.integers(0, 8000, 100)] + \
        0.03 * rng.standard_normal((100, 64)).astype(np.float32)
    gt = np.argmax(q @ db.T, axis=1)
    _, ids = idx.search(q, k=10, ef_search=128)
    recall = np.mean([gt[i] in ids[i] for i in range(100)])
    assert recall >= 0.95, f"HNSW top-10 recall {recall}"


def test_hnsw_incremental_add(rng):
    a, b = _unit(rng, 500), _unit(rng, 500)
    idx = HNSWIndex(d=64)
    idx.add(a)
    idx.add(b)
    assert idx.ntotal == 1000
    _, ids = idx.search(b[:3], k=1, ef_search=64)
    np.testing.assert_array_equal(ids[:, 0], [500, 501, 502])


def test_hnsw_k_exceeds_n(rng):
    db = _unit(rng, 5)
    idx = HNSWIndex(d=64)
    idx.add(db)
    scores, ids = idx.search(db[:1], k=8)
    assert (ids[0, 5:] == -1).all()
