"""Learning-rate schedules and optimizer selection.

Mirrors the reference trainer's wiring (``model/trainer.py:119-140``):
  - 'cos'          tf.keras CosineDecay(alpha=1e-6) over total steps;
  - 'cos-restart'  CosineDecayRestarts(first_decay=10% of total, t_mul=2,
                   m_mul=1, alpha=2e-6);
  - anything else  constant LR.
Optimizer: 'ADAM' (TF defaults: eps 1e-7) or 'LAMB' (optim/lamb.py).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict

import jax.numpy as jnp
import optax

from nafp_tpu.optim.lamb import lamb


def cosine_decay(initial_lr: float, decay_steps: int,
                 alpha: float = 1e-6) -> Callable:
    def schedule(step):
        frac = jnp.minimum(step.astype(jnp.float32), decay_steps) / decay_steps
        cosined = 0.5 * (1.0 + jnp.cos(math.pi * frac))
        return initial_lr * ((1 - alpha) * cosined + alpha)
    return schedule


def cosine_decay_restarts(initial_lr: float, first_decay_steps: int,
                          t_mul: float = 2.0, m_mul: float = 1.0,
                          alpha: float = 2e-6) -> Callable:
    """TF CosineDecayRestarts semantics (SGDR, Loshchilov & Hutter 2016)."""
    def schedule(step):
        step = step.astype(jnp.float32)
        completed = step / first_decay_steps
        if t_mul == 1.0:
            i_restart = jnp.floor(completed)
            frac = completed - i_restart
        else:
            i_restart = jnp.floor(
                jnp.log1p(completed * (t_mul - 1.0)) / math.log(t_mul))
            sum_r = (t_mul ** i_restart - 1.0) / (t_mul - 1.0)
            frac = (completed - sum_r) / t_mul ** i_restart
        m_fac = m_mul ** i_restart
        cosined = 0.5 * m_fac * (1.0 + jnp.cos(math.pi * frac))
        return initial_lr * ((1 - alpha) * cosined + alpha)
    return schedule


def build_lr_schedule(cfg: Dict[str, Any], total_steps: int):
    lr = float(cfg["TRAIN"]["LR"])
    kind = str(cfg["TRAIN"]["LR_SCHEDULE"]).upper()
    if kind == "COS":
        return cosine_decay(lr, total_steps, alpha=1e-6)
    if kind == "COS-RESTART":
        return cosine_decay_restarts(lr, max(1, int(total_steps * 0.1)),
                                     alpha=2e-6)
    return lambda step: jnp.asarray(lr, jnp.float32)


def build_optimizer(cfg: Dict[str, Any],
                    total_steps: int) -> optax.GradientTransformation:
    schedule = build_lr_schedule(cfg, total_steps)
    name = str(cfg["TRAIN"]["OPTIMIZER"]).upper()
    if name == "LAMB":
        return lamb(schedule)
    if name == "ADAM":
        return optax.adam(schedule, eps=1e-7)  # TF Adam default eps
    raise NotImplementedError(cfg["TRAIN"]["OPTIMIZER"])
