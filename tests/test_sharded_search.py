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


def test_sharded_ivfsq8_matches_single_device(rng):
    """With nprobe == nlist every row is scanned by both layouts, so the
    mesh-sharded IVF-SQ8 must reproduce the single-device index exactly
    (same centroids via same seed; same per-vector int8 quantization)."""
    from nafp_tpu.search.index import IVFSQ8Index
    from nafp_tpu.search.sharded import ShardedIVFSQ8Index

    db = rng.standard_normal((6001, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, len(db), 40)] + \
        0.02 * rng.standard_normal((40, 64)).astype(np.float32)

    single = IVFSQ8Index(d=64, nlist=16, nprobe=16)
    single.train(db)
    single.add(db)
    dv, di = single.search(q, k=10)

    sharded = ShardedIVFSQ8Index(d=64, nlist=16, nprobe=16)
    assert sharded.mesh.size == 8
    sharded.train(db)
    sharded.add(db)
    sv, si = sharded.search(q, k=10)

    np.testing.assert_allclose(np.sort(sv, axis=1), np.sort(dv, axis=1),
                               rtol=1e-5, atol=1e-6)
    # id sets agree except where bf16 score ties allow either order
    for r in range(len(q)):
        only = set(di[r]) ^ set(si[r])
        if only:
            cut = min(dv[r].min(), sv[r].min())
            # any disagreeing id must sit at the tie boundary
            assert np.isclose(sorted(dv[r])[0], cut, atol=1e-6)
    assert (si[:, 0] == di[:, 0]).all()


def test_sharded_ivfsq8_partial_probe_recall(rng):
    """At nprobe << nlist the sharded index must match the single-device
    index's recall against exact search (same probed lists, same rows)."""
    from nafp_tpu.search.index import FlatIndex, IVFSQ8Index
    from nafp_tpu.search.sharded import ShardedIVFSQ8Index

    db = rng.standard_normal((8000, 32)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, len(db), 64)] + \
        0.02 * rng.standard_normal((64, 32)).astype(np.float32)
    _, gt = FlatIndex(db, metric="ip").search(q, k=5)

    def recall(idx):
        idx.train(db)
        idx.add(db)
        _, ids = idx.search(q, k=5)
        return np.mean([len(set(a) & set(b)) / 5.0 for a, b in zip(ids, gt)])

    r_single = recall(IVFSQ8Index(d=32, nlist=32, nprobe=8))
    r_sharded = recall(ShardedIVFSQ8Index(d=32, nlist=32, nprobe=8))
    assert r_sharded >= r_single - 0.02
    assert r_sharded > 0.5


def test_sharded_sq8flat_matches_single_device(rng):
    """Row-sharded exact int8 scan == single-device SQ8FlatIndex: the
    shards cover disjoint row ranges and the merge is a global top-k, so
    ids and scores must match exactly (same quantization per row)."""
    from nafp_tpu.search.index import SQ8FlatIndex
    from nafp_tpu.search.sharded import ShardedSQ8FlatIndex
    db = rng.standard_normal((5003, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, 5003, 16)] + \
        0.02 * rng.standard_normal((16, 128)).astype(np.float32)
    single = SQ8FlatIndex()
    single.add(db)
    sv, si = single.search(q, k=5)
    sharded = ShardedSQ8FlatIndex()
    assert sharded.mesh.size == 8
    sharded.add(db)
    mv, mi = sharded.search(q, k=5)
    np.testing.assert_array_equal(mi, si)
    np.testing.assert_allclose(mv, sv, rtol=1e-6)
    assert (mi >= 0).all() and (mi < 5003).all()

def test_sharded_sq8flat_persist_load_roundtrip(rng, tmp_path):
    """A store persisted by the sharded add must load onto the mesh AND
    into the single-device index (shared npz format), with identical
    search results all around — one quantize pass serves every topology."""
    from nafp_tpu.search.index import SQ8FlatIndex
    from nafp_tpu.search.sharded import ShardedSQ8FlatIndex
    db = rng.standard_normal((4100, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, len(db), 12)] + \
        0.02 * rng.standard_normal((12, 128)).astype(np.float32)
    path = str(tmp_path / "sq8_store.npz")

    built = ShardedSQ8FlatIndex()
    built.add(db, persist_path=path)
    bv, bi = built.search(q, k=5)

    loaded = ShardedSQ8FlatIndex.load(path)
    lv, li = loaded.search(q, k=5)
    assert loaded.ntotal == built.ntotal
    np.testing.assert_array_equal(li, bi)
    np.testing.assert_allclose(lv, bv, rtol=1e-6)

    single = SQ8FlatIndex.load(path)   # cross-topology: same npz
    sv, si = single.search(q, k=5)
    np.testing.assert_array_equal(si, bi)


def test_sharded_sq8flat_loads_single_device_store(rng, tmp_path):
    """The reverse direction: a store persisted by the single-device
    SQ8FlatIndex.add loads onto the mesh (repadded to R*BLK)."""
    from nafp_tpu.search.index import SQ8FlatIndex
    from nafp_tpu.search.sharded import ShardedSQ8FlatIndex
    db = rng.standard_normal((3000, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, len(db), 8)] + \
        0.02 * rng.standard_normal((8, 128)).astype(np.float32)
    path = str(tmp_path / "sq8_single.npz")
    single = SQ8FlatIndex()
    single.add(db, persist_path=path)
    sv, si = single.search(q, k=5)
    sharded = ShardedSQ8FlatIndex.load(path)
    mv, mi = sharded.search(q, k=5)
    assert sharded.ntotal == 3000
    np.testing.assert_array_equal(mi, si)


def test_sharded_ivfsq8_persist_load_roundtrip(rng, tmp_path):
    """Sharded IVF-SQ8 persists in the single-device npz format; loading
    reconstructs the round-robin shard layout exactly (same ids/scores),
    and the single-device index loads the same file."""
    from nafp_tpu.search.index import IVFSQ8Index
    from nafp_tpu.search.sharded import ShardedIVFSQ8Index
    db = rng.standard_normal((6001, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, len(db), 24)] + \
        0.02 * rng.standard_normal((24, 64)).astype(np.float32)
    path = str(tmp_path / "ivfsq8_store.npz")

    built = ShardedIVFSQ8Index(d=64, nlist=16, nprobe=16)
    built.train(db)
    built.add(db, persist_path=path)
    bv, bi = built.search(q, k=10)

    loaded = ShardedIVFSQ8Index.load(path, nprobe=16)
    lv, li = loaded.search(q, k=10)
    assert loaded.ntotal == built.ntotal
    assert loaded.list_cap == built.list_cap
    np.testing.assert_array_equal(li, bi)
    np.testing.assert_allclose(lv, bv, rtol=1e-6)

    single = IVFSQ8Index.load(path, nprobe=16)   # cross-topology
    dv, di = single.search(q, k=10)
    assert (di[:, 0] == bi[:, 0]).all()


def test_sharded_ivfsq8_loads_single_device_store(rng, tmp_path):
    """A store built+persisted by the single-device IVFSQ8Index loads onto
    the mesh: the dealt layout scans the same rows per probe, so top-1
    must agree."""
    from nafp_tpu.search.index import IVFSQ8Index
    from nafp_tpu.search.sharded import ShardedIVFSQ8Index
    db = rng.standard_normal((5000, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, len(db), 24)] + \
        0.02 * rng.standard_normal((24, 64)).astype(np.float32)
    path = str(tmp_path / "ivfsq8_single.npz")
    single = IVFSQ8Index(d=64, nlist=16, nprobe=16)
    single.train(db)
    single.add(db, persist_path=path)
    dv, di = single.search(q, k=10)
    sharded = ShardedIVFSQ8Index.load(path, nprobe=16)
    sv, si = sharded.search(q, k=10)
    assert sharded.ntotal == 5000
    assert (si[:, 0] == di[:, 0]).all()
    np.testing.assert_allclose(np.sort(sv, axis=1), np.sort(dv, axis=1),
                               rtol=1e-5, atol=1e-6)
