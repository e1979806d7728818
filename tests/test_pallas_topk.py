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
    v, i = topk_ip_pallas(jnp.asarray(q), jnp.asarray(db), k=8, blk=64,
                          interpret=INTERP)
    assert (np.asarray(i) < 100).all() and (np.asarray(i) >= 0).all()
    assert (np.asarray(v) < 0).all()
