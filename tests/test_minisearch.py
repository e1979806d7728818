"""Mini-search validation: device-side rank math vs a naive host mirror."""
import jax.numpy as jnp
import numpy as np

from nafp_tpu.search.minisearch import (conv_eye, mini_search_eval,
                                        pairwise_distances)


def _naive_ranks(all_d, scope, sign, gt_id_offset):
    """Reference rank computation: the pre-r4 argsort + per-target scan."""
    d = np.asarray(conv_eye(jnp.asarray(all_d), scope)) * sign
    order = np.argsort(d, axis=2, kind="stable")
    n_targets = order.shape[1]
    ranks = np.empty((order.shape[0], n_targets), np.int64)
    for t in range(n_targets):
        gt = t + gt_id_offset
        _, r = np.where(order[:, t, :] == gt)
        ranks[:, t] = r
    return ranks


def test_device_rank_matches_argsort_scan(rng):
    """sum(d < d_gt) == position of gt in the ascending argsort (ties are
    measure-zero on random floats)."""
    from nafp_tpu.search.minisearch import _ranks_for_scope
    q = rng.standard_normal((20, 2, 16)).astype(np.float32)
    db = rng.standard_normal((30, 16)).astype(np.float32)
    db[:20] = q[:, 0] + 0.05 * rng.standard_normal((20, 16))
    all_d = pairwise_distances(jnp.asarray(q), jnp.asarray(db), squared=True)
    for scope in (1, 3, 5):
        got = np.asarray(_ranks_for_scope(all_d, scope, 1.0, 0))
        want = _naive_ranks(np.asarray(all_d), scope, 1.0, 0)
        np.testing.assert_array_equal(got, want)


def test_mini_search_eval_end_to_end(rng):
    """Planted matches must rank top-1 at every scope, both modes."""
    db = rng.standard_normal((40, 32)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[:25, None, :] + 0.01 * rng.standard_normal(
        (25, 1, 32)).astype(np.float32)
    for mode in ("argmin", "argmax"):
        (top1, top3, top10), mrank = mini_search_eval(
            jnp.asarray(q), jnp.asarray(db), scopes=(1, 3), mode=mode,
            display=False)
        assert (top1 == 100.0).all(), (mode, top1)
        assert (mrank == 0.0).all()


def test_mini_search_eval_gt_offset(rng):
    """gt_id_offset shifts the ground-truth row (db rows [off, off+nQ))."""
    off = 7
    db = rng.standard_normal((50, 32)).astype(np.float32)
    q = db[off:off + 20, None, :] + 0.01 * rng.standard_normal(
        (20, 1, 32)).astype(np.float32)
    (top1, _, _), _ = mini_search_eval(jnp.asarray(q), jnp.asarray(db),
                                       scopes=(1,), display=False,
                                       gt_id_offset=off)
    assert top1[0] == 100.0


def test_collapsed_embeddings_read_as_chance_not_perfect():
    """A collapsed model (all embeddings identical — the SpecAug failure
    mode in CLAUDE.md) ties every db row with the ground truth; the
    monitor must report ~0 % top-1, not 100 % (ties count against gt)."""
    q = jnp.ones((10, 1, 8), jnp.float32)
    db = jnp.ones((30, 8), jnp.float32)
    (top1, _, top10), mrank = mini_search_eval(q, db, scopes=(1,),
                                               display=False)
    assert top1[0] == 0.0
    assert top10[0] == 0.0
    assert mrank[0] == 29.0  # all 29 non-gt rows tie ahead of gt
