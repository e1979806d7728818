"""Spectral augmentation chain (SpecAugment + N-CutOut) — fully vectorized.

TPU-native re-design of the reference chain
(``model/fp/specaug_chain/specaug_chain.py:43-192`` and
``layers/ncutout_tarray.py:38-301``). The reference builds hole masks with a
per-sample Python/TensorArray loop (``ncutout_tarray.py:171-186``) and its
own README records 359 ms per batch for per-sample masks vs <5 ms for a
single shared mask. Here masks are built by broadcasted index comparisons —
``(B, n_holes, F, T)`` boolean algebra on the VPU — so **per-sample masks
cost the same as the shared one** (config ``SPEC_AUG.UNIFORM_MASK=False``).
The default stays uniform_mask=True, matching the reference's semantics:
with per-sample masks the anchor and its replica receive *different* holes,
a strictly stronger invariance demand that we measured collapsing NT-Xent
training (loss pinned at 2·ln(2n-1), embeddings identical) where the shared
mask trains fine.

Semantics preserved per layer kind (``specaug_chain.py:113-145``):
  - 'cutout'     rectangular holes, sizes in [dim//10, dim/2.5) each axis;
  - 'vertical'   a full-height time stripe, width in [5, 16);
  - 'horizontal' a full-width freq stripe, height in [5, 20);
hole ranges use the reference's center/clip arithmetic
(``ncutout_tarray.py:164-168``), per-hole activation probability, and hole
fillers 'min'/'zeros'/'random'/[lo, hi] (``:200-211``; note the reference's
'min' actually fills with the *mean* magnitude — reproduced, documented).

Deliberate deviation: the reference's 'random' filler multiplies a noise
buffer drawn once at layer-build time (``:106-115``); ours redraws from the
step PRNG key — strictly more random, and stateless.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

LayerKind = str  # 'cutout' | 'vertical' | 'horizontal'


def _hole_ranges(key: jax.Array, kind: LayerKind, b: int, n_holes: int,
                 h: int, w: int) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Random hole [start, end] (inclusive) ranges per (sample, hole)."""
    k_w, k_h, k_x, k_y = jax.random.split(key, 4)

    if kind == "cutout":
        ws = jax.random.randint(k_w, (b, n_holes), w // 10, int(w / 2.5))
        hs = jax.random.randint(k_h, (b, n_holes), h // 10, int(h / 2.5))
        xs = jax.random.randint(k_x, (b, n_holes), 0, w - 1)
        ys = jax.random.randint(k_y, (b, n_holes), 0, h - 1)
    elif kind == "vertical":  # full-height time stripe (specaug_chain.py:124-133)
        ws = jax.random.randint(k_w, (b, n_holes), 5, 16)
        hs = jnp.full((b, n_holes), h)
        xs = jax.random.randint(k_x, (b, n_holes), 0, w - 1)
        ys = jnp.full((b, n_holes), h // 2)
    elif kind == "horizontal":  # full-width freq stripe (:134-143)
        ws = jnp.full((b, n_holes), w)
        hs = jax.random.randint(k_h, (b, n_holes), 5, 20)
        xs = jnp.full((b, n_holes), w // 2)
        ys = jax.random.randint(k_y, (b, n_holes), 0, h - 1)
    else:
        raise NotImplementedError(kind)

    x_start = jnp.clip(xs - ws // 2, 0, w - 2)
    x_end = jnp.clip(xs + ws // 2, 1, w - 1)
    y_start = jnp.clip(ys - hs // 2, 0, h - 2)
    y_end = jnp.clip(ys + hs // 2, 1, h - 1)
    return y_start, y_end, x_start, x_end


def _filler(key: jax.Array, x: jax.Array,
            hole_fill: Union[str, Sequence[float]]) -> jax.Array:
    """Hole filler tensor, shape of x (ncutout_tarray.py:200-211)."""
    if hole_fill == "zeros":
        return jnp.zeros_like(x)
    if hole_fill == "min":
        # Reference quirk: 'min' fills with the batch MEAN (hf=ones*mean).
        return jnp.full_like(x, jnp.mean(x))
    if hole_fill == "random":
        u = jax.random.uniform(key, x.shape, x.dtype)
        return u * (jnp.max(x) - jnp.min(x)) + jnp.min(x)
    lo, hi = float(hole_fill[0]), float(hole_fill[1])
    return jax.random.uniform(key, x.shape, x.dtype, lo, hi)


def _ncutout(x: jax.Array, key: jax.Array, kind: LayerKind, prob: float,
             n_holes: int, hole_fill, uniform_mask: bool) -> jax.Array:
    """One chain layer on (B, F, T, 1)."""
    bsz, h, w, _ = x.shape
    b = 1 if uniform_mask else bsz
    k_holes, k_act, k_fill, k_sample = jax.random.split(key, 4)

    ys, ye, xs, xe = _hole_ranges(k_holes, kind, b, n_holes, h, w)
    iy = jnp.arange(h)[None, None, :]                       # (1,1,H)
    ix = jnp.arange(w)[None, None, :]                       # (1,1,W)
    mask_h = (ys[..., None] <= iy) & (iy <= ye[..., None])  # (b,n,H)
    mask_w = (xs[..., None] <= ix) & (ix <= xe[..., None])  # (b,n,W)

    if uniform_mask:
        # All holes active in the shared mask; per-sample bernoulli gates the
        # whole augmentation (ncutout_tarray.py:252-268).
        hole_act = jnp.ones((b, n_holes), bool)
    else:
        hole_act = jax.random.uniform(k_act, (b, n_holes)) < prob

    mask = jnp.any(mask_h[:, :, :, None] & mask_w[:, :, None, :]
                   & hole_act[:, :, None, None], axis=1)    # (b,H,W)
    mask = mask[..., None]                                  # (b,H,W,1)

    filler = _filler(k_fill, x, hole_fill)
    if uniform_mask:
        act = (jax.random.uniform(k_sample, (bsz, 1, 1, 1)) < prob)
        return jnp.where(mask & act, filler, x)
    return jnp.where(mask, filler, x)


@functools.partial(jax.jit, static_argnames=("chain", "probs", "n_holes",
                                             "hole_fill", "uniform_mask"))
def spec_augment(x: jax.Array,
                 key: jax.Array,
                 chain: Tuple[LayerKind, ...] = ("cutout", "horizontal"),
                 probs: Union[float, Tuple[float, ...]] = 1.0,
                 n_holes: int = 1,
                 hole_fill="zeros",
                 uniform_mask: bool = True) -> jax.Array:
    """Apply the ordered augmentation chain to a (B, F, T, 1) batch."""
    if not isinstance(probs, tuple):
        probs = (float(probs),) * len(chain)
    if len(probs) < len(chain):
        probs = probs * len(chain)
    keys = jax.random.split(key, len(chain))
    for i, kind in enumerate(chain):
        n = n_holes if kind == "cutout" else 1  # chain builder :114-143
        x = _ncutout(x, keys[i], kind, probs[i], n, hole_fill, uniform_mask)
    return x


def get_specaug_fn(cfg: Dict[str, Any]):
    """Closure from a framework config (counterpart of
    ``get_specaug_chain_layer``, specaug_chain.py:173-192)."""
    sa = cfg["SPEC_AUG"]
    hole_fill = sa["SPECAUG_HOLE_FILL"]
    if isinstance(hole_fill, list):
        hole_fill = tuple(hole_fill)
    return functools.partial(
        spec_augment,
        chain=tuple(sa["SPECAUG_CHAIN"]),
        probs=tuple(sa["SPECAUG_PROBS"]) if isinstance(sa["SPECAUG_PROBS"], list)
        else float(sa["SPECAUG_PROBS"]),
        n_holes=int(sa["SPECAUG_N_HOLES"]),
        hole_fill=hole_fill,
        uniform_mask=bool(sa.get("UNIFORM_MASK", True)))
