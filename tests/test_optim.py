"""Optimizer and schedule tests (LAMB vs a numpy transcription of TF-Addons)."""
import jax
import jax.numpy as jnp
import numpy as np

from nafp_tpu.optim.lamb import lamb
from nafp_tpu.optim.schedules import (build_optimizer, cosine_decay,
                                      cosine_decay_restarts)


def _np_lamb_step(p, g, m, v, step, lr, b1=0.9, b2=0.999, eps=1e-6, wd=1e-6):
    """TF-Addons LAMB dense step (lamb_optimizer.py:123-158)."""
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    m_hat = m / (1 - b1 ** step)
    v_hat = v / (1 - b2 ** step)
    update = m_hat / (np.sqrt(v_hat) + eps) + wd * p
    w_norm = np.linalg.norm(p)
    g_norm = np.linalg.norm(update)
    ratio = (w_norm / g_norm) if (w_norm > 0 and g_norm > 0) else 1.0
    return p - ratio * lr * update, m, v


def test_lamb_matches_tf_addons_math(rng):
    p0 = rng.standard_normal((5, 3)).astype(np.float32)
    params = {"w": jnp.asarray(p0)}
    opt = lamb(1e-2)
    state = opt.init(params)
    p_np, m_np, v_np = p0.copy(), np.zeros_like(p0), np.zeros_like(p0)
    for step in range(1, 4):
        g_np = rng.standard_normal((5, 3)).astype(np.float32)
        grads = {"w": jnp.asarray(g_np)}
        updates, state = opt.update(grads, state, params)
        params = jax.tree.map(lambda x, u: x + u, params, updates)
        p_np, m_np, v_np = _np_lamb_step(p_np, g_np, m_np, v_np, step, 1e-2)
        np.testing.assert_allclose(np.asarray(params["w"]), p_np, rtol=2e-5,
                                   err_msg=f"step {step}")


def test_lamb_zero_params_trust_ratio_one():
    params = {"w": jnp.zeros((4,))}
    opt = lamb(1e-1)
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones((4,))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_cosine_decay_envelope():
    s = cosine_decay(1e-4, 1000)
    assert abs(float(s(jnp.asarray(0))) - 1e-4) < 1e-9
    assert float(s(jnp.asarray(500))) < 1e-4 * 0.51
    assert float(s(jnp.asarray(1000))) < 1e-4 * 1e-5
    assert float(s(jnp.asarray(2000))) == float(s(jnp.asarray(1000)))  # clamped


def test_cosine_restarts_restarts():
    s = cosine_decay_restarts(1e-4, 100)
    v_end_first = float(s(jnp.asarray(99)))
    v_restart = float(s(jnp.asarray(101)))
    assert v_restart > v_end_first * 10  # LR jumps back up


def test_build_optimizer_from_cfg():
    from nafp_tpu.configuration import load_config
    cfg = load_config("default")
    opt = build_optimizer(cfg, total_steps=1000)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones((3,))}, state, params)
    assert np.asarray(updates["w"]).shape == (3,)
    cfg["TRAIN"]["OPTIMIZER"] = "LAMB"
    opt = build_optimizer(cfg, total_steps=1000)
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones((3,))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
