"""Sharded exact search must equal single-device exact search bit-for-bit
(scores) on the 8-device CPU mesh."""
import numpy as np

from nafp_tpu.search.index import FlatIndex
from nafp_tpu.search.sharded import ShardedFlatIndex


def test_sharded_equals_flat(rng):
    db = rng.standard_normal((4001, 64)).astype(np.float32)  # non-divisible
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, 4001, 33)] + \
        0.01 * rng.standard_normal((33, 64)).astype(np.float32)
    flat = FlatIndex(db, metric="ip")
    fv, fi = flat.search(q, k=7)
    sharded = ShardedFlatIndex(db)
    assert sharded.mesh.size == 8
    sv, si = sharded.search(q, k=7)
    np.testing.assert_allclose(sv, fv, atol=1e-5)
    np.testing.assert_array_equal(si[:, 0], fi[:, 0])
    # all returned ids must be genuine (no pad leakage)
    assert (si >= 0).all() and (si < 4001).all()


def test_sharded_query_blocks(rng):
    db = rng.standard_normal((1024, 32)).astype(np.float32)
    q = rng.standard_normal((300, 32)).astype(np.float32)
    idx = ShardedFlatIndex(db)
    v1, i1 = idx.search(q, k=5, block=128)
    v2, i2 = idx.search(q, k=5, block=512)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
