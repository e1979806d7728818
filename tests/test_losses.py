"""Loss parity tests.

NT-Xent is checked against a naive numpy transcription of the reference
single-GPU math (drop-diag + softmax CE; NTxent_loss_single_gpu.py:53-82)
and for exact single-device <-> 8-device-mesh equivalence.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nafp_tpu.losses import ntxent_loss, online_triplet_loss


def _np_ntxent(ha, hb, tau):
    """Literal numpy transcription of the reference single-GPU loss."""
    n = ha.shape[0]

    def drop_diag(m):
        out = np.zeros((n, n - 1))
        for i in range(n):
            out[i] = np.delete(m[i], i)
        return out

    def softmax_ce(labels_onehot, logits):
        logits = logits - logits.max(axis=1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
        return -(labels_onehot * logp).sum(axis=1).mean()

    labels = np.eye(n, 2 * n - 1)
    ab = ha @ hb.T / tau
    aa = drop_diag(ha @ ha.T / tau)
    ba = hb @ ha.T / tau
    bb = drop_diag(hb @ hb.T / tau)
    return (softmax_ce(labels, np.concatenate([ab, aa], 1)) +
            softmax_ce(labels, np.concatenate([ba, bb], 1)))


def _unit_rows(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_ntxent_matches_reference_math(rng):
    ha = _unit_rows(rng, 16, 32)
    hb = _unit_rows(rng, 16, 32)
    loss, sim = jax.jit(functools.partial(ntxent_loss, tau=0.05))(
        jnp.asarray(ha), jnp.asarray(hb))
    want = _np_ntxent(ha, hb, 0.05)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    assert sim.shape == (16, 32)


def test_ntxent_multidevice_equals_single(rng):
    n, d = 32, 16  # 4 rows per device on the 8-device mesh
    ha = jnp.asarray(_unit_rows(rng, n, d))
    hb = jnp.asarray(_unit_rows(rng, n, d))
    single, _ = jax.jit(functools.partial(ntxent_loss, tau=0.05))(ha, hb)

    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P("data"), P("data")),
                       out_specs=P())
    def sharded_loss(a, b):
        loss, _ = ntxent_loss(a, b, tau=0.05, axis_name="data")
        return loss[None]

    multi = sharded_loss(ha, hb)[0]
    np.testing.assert_allclose(float(multi), float(single), rtol=1e-5)


def test_ntxent_perfect_alignment_lower_loss(rng):
    ha = _unit_rows(rng, 8, 16)
    loss_aligned, _ = ntxent_loss(jnp.asarray(ha), jnp.asarray(ha), tau=0.05)
    hb = _unit_rows(rng, 8, 16)
    loss_random, _ = ntxent_loss(jnp.asarray(ha), jnp.asarray(hb), tau=0.05)
    assert float(loss_aligned) < float(loss_random)


def test_ntxent_gradients_finite(rng):
    ha = jnp.asarray(_unit_rows(rng, 8, 16))
    hb = jnp.asarray(_unit_rows(rng, 8, 16))
    g = jax.jit(jax.grad(lambda a, b: ntxent_loss(a, b)[0]))(ha, hb)
    assert np.isfinite(np.asarray(g)).all()


def _np_triplet(emb_a, emb_p, n_anchor, n_ppa, margin, mode):
    """Numpy transcription of the reference triplet loss (:198-239)."""
    n_pos = n_anchor * n_ppa
    ap = np.zeros((n_anchor, n_pos + n_anchor), np.float32)
    for a in range(n_anchor):
        ap[a, a * n_ppa:(a + 1) * n_ppa] = 1
    an = 1 - ap
    an[:, n_pos:] = 1 - np.eye(n_anchor)
    cols = np.concatenate([emb_p, emb_a], axis=0)
    d = 2 * (1 - emb_a @ cols.T)
    mask = (d > 0).astype(np.float32)
    d = np.sqrt(d * mask + 1e-9)
    ap_d = d * ap
    if mode == "all":
        return np.maximum(ap_d - d * an + margin, 0).mean()
    if mode == "hardest":
        # Fixed semantics: min over REAL negatives (the reference mins the
        # mask-zeroed matrix, which is identically 0 — triplet.py fix #2).
        an_d = np.where(an > 0, d, np.inf).min(1)
        return np.maximum(ap_d.max(1) - an_d + margin, 0).mean()
    if mode == "semi-hard":
        h = ap_d.max(1, keepdims=True)
        return np.maximum((h - d + margin) * an, 0).mean()
    if mode == "all-balanced":
        return np.maximum(ap_d.sum(1) / ap.sum(1) -
                          (d * an).sum(1) / an.sum(1) + margin, 0).mean()
    raise NotImplementedError


def test_triplet_hardest_negatives_matter(rng):
    """Regression for triplet.py fix #2: pulling a negative closer to an
    anchor must INCREASE the 'hardest' loss. Under the reference's
    mask-zeroed min the negative term is identically 0 and this fails."""
    n_anchor, n_ppa, dim = 4, 2, 16
    emb_a = _unit_rows(rng, n_anchor, dim)
    emb_p = _unit_rows(rng, n_anchor * n_ppa, dim)
    base, _, _ = online_triplet_loss(
        jnp.asarray(emb_a), jnp.asarray(emb_p),
        n_anchor=n_anchor, n_pos_per_anchor=n_ppa, mode="hardest",
        margin=2.5)  # margin > max distance so the hinge is always active
    emb_p2 = emb_p.copy()
    # replica of anchor 1 moved onto anchor 0 -> anchor 0's closest
    # negative distance drops to ~0
    emb_p2[1 * n_ppa] = emb_a[0]
    closer, _, _ = online_triplet_loss(
        jnp.asarray(emb_a), jnp.asarray(emb_p2),
        n_anchor=n_anchor, n_pos_per_anchor=n_ppa, mode="hardest",
        margin=2.5)
    assert float(closer) > float(base)


def test_triplet_all_modes_match_reference_math(rng):
    n_anchor, n_ppa, d = 8, 4, 16
    emb_a = _unit_rows(rng, n_anchor, d)
    emb_p = _unit_rows(rng, n_anchor * n_ppa, d)
    for mode in ["all", "all-balanced", "hardest", "semi-hard"]:
        loss, dists, n_act = online_triplet_loss(
            jnp.asarray(emb_a), jnp.asarray(emb_p),
            n_anchor=n_anchor, n_pos_per_anchor=n_ppa, mode=mode)
        want = _np_triplet(emb_a, emb_p, n_anchor, n_ppa, 0.5, mode)
        np.testing.assert_allclose(float(loss), want, rtol=1e-5,
                                   err_msg=f"mode={mode}")
        assert dists.shape == (n_anchor, n_anchor * n_ppa + n_anchor)
        assert float(n_act) >= 0
