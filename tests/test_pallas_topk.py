"""Pallas fused top-k kernel vs lax.top_k ground truth (interpret mode on
the CPU test mesh; the real-TPU path is exercised by bench_search.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from nafp_tpu.search.pallas_topk import topk_ip_pallas

INTERP = jax.default_backend() != "tpu"


def _check(q, db, k, blk):
    v, i = topk_ip_pallas(jnp.asarray(q), jnp.asarray(db), k=k, blk=blk,
                          interpret=INTERP)
    sim = q.astype(np.float64) @ db.T.astype(np.float64)
    gt_v, gt_i = jax.lax.top_k(jnp.asarray(sim.astype(np.float32)), k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(gt_v), atol=1e-4)
    # ids may differ on exact ties; compare scores at returned ids instead
    got_scores = np.take_along_axis(sim, np.asarray(i, np.int64), axis=1)
    np.testing.assert_allclose(got_scores, np.asarray(gt_v), atol=1e-4)


def test_matches_lax_topk(rng):
    q = rng.standard_normal((8, 128)).astype(np.float32)
    db = rng.standard_normal((1000, 128)).astype(np.float32)
    _check(q, db, k=8, blk=256)


def test_n_not_multiple_of_block(rng):
    q = rng.standard_normal((8, 128)).astype(np.float32)
    db = rng.standard_normal((777, 128)).astype(np.float32)
    _check(q, db, k=16, blk=256)


def test_single_block(rng):
    q = rng.standard_normal((8, 128)).astype(np.float32)
    db = rng.standard_normal((200, 128)).astype(np.float32)
    _check(q, db, k=8, blk=256)


def test_negative_scores_beat_padding(rng):
    # all-negative similarities: pad rows (zero vectors, score 0) must not
    # leak into the results
    q = -np.abs(rng.standard_normal((4, 16))).astype(np.float32)
    db = np.abs(rng.standard_normal((100, 16))).astype(np.float32)
    v, i = topk_ip_pallas(jnp.asarray(q), jnp.asarray(db), k=8, blk=128,
                          interpret=INTERP)
    assert (np.asarray(i) < 100).all() and (np.asarray(i) >= 0).all()
    assert (np.asarray(v) < 0).all()


def test_masked_variant_bias_and_interior_ids(rng):
    """topk_ip_pallas_masked: per-subtile bias (probe mask) and interior
    invalid ids must be honored exactly."""
    from nafp_tpu.search.pallas_topk import NEG, topk_ip_pallas_masked

    bq, n, d, blk, lt = 8, 512, 32, 128, 64
    q = rng.standard_normal((bq, d)).astype(np.float32)
    db = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int32)
    ids[rng.integers(0, n, 60)] = -1           # interior invalid rows
    n_sub = n // lt
    bias = np.where(rng.random((bq, n_sub)) < 0.5, 0.0, NEG).astype(np.float32)

    v, i = topk_ip_pallas_masked(jnp.asarray(q), jnp.asarray(db),
                                 jnp.asarray(ids), jnp.asarray(bias),
                                 k=8, blk=blk, list_tile=lt,
                                 interpret=INTERP)
    # ground truth in numpy
    sim = q @ db.T
    sim = sim + np.repeat(bias, lt, axis=1)
    sim[:, ids < 0] = NEG
    gt_v, gt_i = jax.lax.top_k(jnp.asarray(sim), 8)
    gt_v, gt_i = np.asarray(gt_v), np.asarray(gt_i)
    valid = gt_v > NEG / 2
    np.testing.assert_allclose(np.asarray(v)[valid], gt_v[valid], atol=1e-4)
    got_i = np.asarray(i)
    # returned ids must be the row ids (== positions here) where valid
    assert ((got_i >= 0) == valid).all()
    got_scores = np.where(valid,
                          np.take_along_axis(sim, np.maximum(got_i, 0),
                                             axis=1), NEG)
    np.testing.assert_allclose(got_scores[valid], gt_v[valid], atol=1e-4)


def test_masked_variant_bf16_db(rng):
    from nafp_tpu.search.pallas_topk import topk_ip_pallas_masked

    bq, n, d = 4, 256, 32
    q = rng.standard_normal((bq, d)).astype(np.float32)
    db = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int32)
    bias = np.zeros((bq, n // 64), np.float32)
    v, i = topk_ip_pallas_masked(jnp.asarray(q, jnp.bfloat16).astype(jnp.bfloat16),
                                 jnp.asarray(db).astype(jnp.bfloat16),
                                 jnp.asarray(ids), jnp.asarray(bias),
                                 k=4, blk=128, list_tile=64,
                                 interpret=INTERP)
    sim = q @ db.T
    gt_v, _ = jax.lax.top_k(jnp.asarray(sim), 4)
    np.testing.assert_allclose(np.asarray(v), np.asarray(gt_v),
                               rtol=3e-2, atol=3e-2)
