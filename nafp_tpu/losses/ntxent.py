"""NT-Xent (normalized temperature cross-entropy) — cross-replica native.

The reference ships two implementations: a single-GPU one that is actually
wired into the trainer (``model/fp/NTxent_loss_single_gpu.py:29-82``) and a
multi-replica TPU one that never was (``model/fp/NTxent_loss_tpu.py:91-140``,
emulating all-gather with scatter_nd + all_reduce(SUM)).

This module is the TPU-native unification: **one** formulation written for
a sharded batch on a device mesh, which degenerates exactly to the
single-device math when no ``axis_name`` is given.

Math (matching the reference single-GPU version bit-for-bit in expectation):
  with ha = anchors, hb = replicas (both L2-normalized, n rows each):
    row i of part a: softmax CE over [ha_i·hb_*  , ha_i·ha_{*≠i}] / tau,
                     label = position of hb_i;
    part b symmetric;  loss = mean_a + mean_b.
  Dropping the aa/bb diagonal (reference drop_diag, :47-49) is implemented
  here as −LARGE masking (identical softmax) so shapes stay static.

Cross-replica: each device holds n_local = n/R rows, all-gathers the
embeddings over ``axis_name`` (128-d × global-B is a few MB even at bsz
5120 — one cheap ICI all-gather), computes only its local rows of the
global similarity matrix, and the global mean is a psum of local sums.
This is the recipe that unlocks the bsz-5120 row struck through in the
reference README (:39).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

LARGE_NUM = 1e9  # diagonal mask value (reference NTxent_loss_tpu.py:117-119)


def ntxent_loss(emb_org: jax.Array,
                emb_rep: jax.Array,
                tau: float = 0.05,
                axis_name: Optional[str] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Compute the NT-Xent loss for fingerprint training.

    Args:
      emb_org: (n_local, d) L2-normalized anchor embeddings (this shard).
      emb_rep: (n_local, d) L2-normalized replica embeddings (this shard).
      tau: temperature (0 < tau < 1), reference default 0.05.
      axis_name: mesh axis to all-gather over; None = single device.

    Returns:
      (loss, sim_mtx) where loss is the scalar global loss and sim_mtx is
      this shard's rows of [ab, aa_masked] logits (the reference returns
      the same matrix for TensorBoard imaging, trainer.py:197-198).
    """
    ha, hb = emb_org.astype(jnp.float32), emb_rep.astype(jnp.float32)
    n_local = ha.shape[0]

    if axis_name is None:
        ha_g, hb_g, offset, n_global = ha, hb, 0, n_local
    else:
        # (R, n_local, d) -> (R*n_local, d); replica r owns rows
        # [r*n_local, (r+1)*n_local).
        ha_g = jax.lax.all_gather(ha, axis_name).reshape(-1, ha.shape[-1])
        hb_g = jax.lax.all_gather(hb, axis_name).reshape(-1, hb.shape[-1])
        r = jax.lax.axis_index(axis_name)
        offset = r * n_local
        n_global = ha_g.shape[0]

    # Local rows of the global logits. One fused MXU matmul per block.
    # HIGHEST precision: tau=0.05 scales similarity rounding by 20x in logit
    # space, and these matmuls are negligible FLOPs next to the encoder.
    _dot = lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
    logits_ab = _dot(ha, hb_g.T) / tau
    logits_aa = _dot(ha, ha_g.T) / tau
    logits_ba = _dot(hb, ha_g.T) / tau
    logits_bb = _dot(hb, hb_g.T) / tau

    # Mask self-similarity on the aa/bb blocks (== reference drop_diag).
    rows = jnp.arange(n_local)[:, None]
    cols = jnp.arange(n_global)[None, :]
    self_mask = (cols == rows + offset).astype(jnp.float32)
    logits_aa = logits_aa - self_mask * LARGE_NUM
    logits_bb = logits_bb - self_mask * LARGE_NUM

    # Positive of local row i sits at global column offset+i of the ab block.
    labels = jnp.arange(n_local) + offset

    logits_a = jnp.concatenate([logits_ab, logits_aa], axis=1)  # (n_l, 2n_g)
    logits_b = jnp.concatenate([logits_ba, logits_bb], axis=1)

    def _ce(logits):
        logz = jax.nn.logsumexp(logits, axis=1)
        pos = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
        return logz - pos  # (n_local,)

    loss_sum = jnp.sum(_ce(logits_a)) + jnp.sum(_ce(logits_b))
    if axis_name is not None:
        loss_sum = jax.lax.psum(loss_sum, axis_name)
    # Reference: loss_a and loss_b are each row-means; total = mean_a+mean_b.
    loss = loss_sum / n_global
    return loss, logits_a
