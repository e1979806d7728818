"""SQ8FlatIndex: exact int8 full-scan search (fused Pallas kernel).

Covers the kernel (interpret mode on the CPU backend), the index contract
(add/search/persist/load), reuse of an IVF-SQ8 store npz (the sorted rows
+ original-row ids path), and the int8-quantization ranking guarantee on
L2-normalized fingerprints.
"""
import numpy as np
import pytest

from nafp_tpu.search.index import FlatIndex, IVFSQ8Index, SQ8FlatIndex, \
    get_index


def _unit(rng, n, d=128):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_kernel_matches_f32_exact(rng):
    """Top-k of the int8 scan == f32 exact top-k when gaps exceed the
    quantization noise (well-separated planted neighbors)."""
    db = _unit(rng, 4096 + 100)    # non-multiple of BLK: exercises padding
    q = db[[3, 700, 4100]] + 0.02 * rng.standard_normal((3, 128)).astype(
        np.float32)
    idx = SQ8FlatIndex()
    idx.add(db)
    v, ids = idx.search(q, k=5)
    np.testing.assert_array_equal(ids[:, 0], [3, 700, 4100])
    assert (np.diff(v, axis=1) <= 1e-6).all()     # scores descending
    assert (ids >= 0).all()                       # padding never surfaces


def test_topk_set_matches_flat(rng):
    """Full top-k id SET matches the f32 FlatIndex on random queries up to
    int8 rounding near rank boundaries (allow 1 swap in 20)."""
    db = _unit(rng, 6000)
    q = _unit(rng, 64)
    _, exact = FlatIndex(db, metric="ip").search(q, k=20)
    idx = get_index("sq8", db)
    idx.add(db)
    _, got = idx.search(q, k=20)
    overlap = np.array([len(set(exact[i]) & set(got[i]))
                        for i in range(len(q))])
    assert (overlap >= 19).all(), overlap.min()
    # top-1 must agree exactly
    np.testing.assert_array_equal(exact[:, 0], got[:, 0])


def test_blocked_equals_single(rng):
    db = _unit(rng, 3000)
    q = _unit(rng, 700)
    idx = SQ8FlatIndex()
    idx.add(db)
    _, a = idx.search(q, k=3, block=256)
    _, b = idx.search(q, k=3, block=1024)
    np.testing.assert_array_equal(a, b)


def test_persist_and_load(tmp_path, rng):
    db = _unit(rng, 2100)
    q = _unit(rng, 33)
    idx = SQ8FlatIndex()
    idx.add(db, persist_path=str(tmp_path / "store.npz"))
    v0, i0 = idx.search(q, k=7)
    idx2 = SQ8FlatIndex.load(str(tmp_path / "store.npz"))
    assert idx2.ntotal == 2100
    v1, i1 = idx2.search(q, k=7)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-6)


def test_load_from_ivfsq8_store(tmp_path, rng):
    """An IVF-SQ8 persisted store (sorted rows, original-row ids, list_cap
    tail padding) loads as a flat store and searches exactly: the id
    indirection maps sorted positions back to caller rows."""
    db = _unit(rng, 3000)
    q = db[[5, 42, 2999]] + 0.02 * rng.standard_normal((3, 128)).astype(
        np.float32)
    ivf = IVFSQ8Index(d=128, nlist=16)
    ivf.train(db)
    ivf.add(db, persist_path=str(tmp_path / "ivf.npz"))
    flat = SQ8FlatIndex.load(str(tmp_path / "ivf.npz"))
    assert flat.ntotal == 3000
    _, ids = flat.search(q, k=5)
    np.testing.assert_array_equal(ids[:, 0], [5, 42, 2999])
    # every returned id is a genuine row (no sorted-position leakage)
    assert (ids >= 0).all() and (ids < 3000).all()
    # and the result set matches quantized exact search over the same data
    _, ids_direct = _direct(db, q)
    np.testing.assert_array_equal(np.sort(ids, 1), np.sort(ids_direct, 1))


def _direct(db, q, k=5):
    idx = SQ8FlatIndex()
    idx.add(db)
    return idx.search(q, k=k)


def test_quantization_cos_floor(rng):
    """Dequantized int8 rows stay cos >= 0.9995 of the f32 originals —
    the ranking-safety margin the exactness claim rests on."""
    db = _unit(rng, 512)
    idx = SQ8FlatIndex()
    idx.add(db)
    q8 = np.asarray(idx.vecs8[:512], np.float32)
    sc = np.asarray(idx.scales[:512])
    rec = q8 * sc[:, None]
    cos = np.sum(rec * db, 1) / np.linalg.norm(rec, axis=1)
    assert cos.min() >= 0.9995, cos.min()
