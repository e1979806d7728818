"""LAMB optimizer as an optax GradientTransformation.

Semantics match the TF-Addons LAMB the reference vendors
(``model/fp/lamb_optimizer.py:26-158``): Adam moments with bias correction,
update = m_hat / (sqrt(v_hat) + eps) + wd * w, per-tensor trust ratio
||w|| / ||update|| (1.0 when either norm is 0), step = -lr * ratio * update.
Defaults mirror the reference (beta1 .9, beta2 .999, eps 1e-6, wd 1e-6).

optax ships its own lamb, but its trust-ratio edge cases and decay wiring
differ subtly from TF-Addons; training-dynamics parity is worth the ~40
lines. Exclusion lists accept parameter-path substrings like the reference's
name patterns.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import optax


class LambState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def lamb(learning_rate: Union[float, Callable],
         b1: float = 0.9,
         b2: float = 0.999,
         eps: float = 1e-6,
         weight_decay: float = 1e-6,
         exclude_from_weight_decay: Sequence[str] = (),
         exclude_from_layer_adaptation: Optional[Sequence[str]] = None,
         ) -> optax.GradientTransformation:
    if exclude_from_layer_adaptation is None:
        exclude_from_layer_adaptation = exclude_from_weight_decay

    def _excluded(path: str, patterns: Sequence[str]) -> bool:
        return any(p in path for p in patterns)

    def init_fn(params):
        return LambState(count=jnp.zeros([], jnp.int32),
                         mu=jax.tree.map(jnp.zeros_like, params),
                         nu=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("lamb requires params")
        # TF/Keras schedules are evaluated at the 0-based iteration (the
        # pre-increment count): step 1 uses schedule(0). Bias correction
        # uses the 1-based count like TF-Addons.
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        flat_p, _ = jax.tree_util.tree_flatten_with_path(params)
        flat_m = jax.tree_util.tree_leaves(mu)
        flat_v = jax.tree_util.tree_leaves(nu)
        new_leaves = []
        for (kp, p), m, v in zip(flat_p, flat_m, flat_v):
            path = jax.tree_util.keystr(kp)
            update = (m / c1) / (jnp.sqrt(v / c2) + eps)
            if weight_decay and not _excluded(path, exclude_from_weight_decay):
                update = update + weight_decay * p
            if not _excluded(path, exclude_from_layer_adaptation):
                w_norm = jnp.linalg.norm(p)
                u_norm = jnp.linalg.norm(update)
                ratio = jnp.where(w_norm > 0,
                                  jnp.where(u_norm > 0, w_norm / u_norm, 1.0),
                                  1.0)
            else:
                ratio = 1.0
            new_leaves.append(-lr * ratio * update)
        updates = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params), new_leaves)
        return updates, LambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
