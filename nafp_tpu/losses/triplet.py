"""Online triplet-mining loss (FaceNet / Now-Playing variant).

Functional JAX counterpart of the reference ``model/fp/online_triplet_loss.py``
(:34-239). Selected by ``LOSS.LOSS_MODE='Online-Triplet'`` (reference
``config/now_playing.yaml:80``; trainer wiring at ``model/trainer.py:159-169``
uses mode 'semi-hard' for train, 'all' with margin 0 for validation).

Batch layout: ``emb_anchor`` (A, d) anchors and ``emb_pos`` (A*P, d)
replicas ordered so replicas of anchor i occupy rows [i*P, (i+1)*P). With
``use_anc_as_pos`` the anchors are appended as extra columns and each
anchor's own column is excluded from the negatives (identity block,
reference :108-114).

Distances are the cosine→L2 conversion ``d = sqrt(2(1 - a·b) + EPS)`` of
the reference fast path (:183-194); inputs must be L2-normalized.

Faithful reproductions of the reference reduction formulas per mode
(:211-236), including the 'all'-mode elementwise (not all-pairs) pairing.
Two deliberate fixes: (1) ``num_active_triplets`` counts positive elements
*before* the mean-reduction — the reference counts on the reduced scalar
(:238), which is always 0 or 1; (2) 'hardest' masks negatives by +inf
before the min — the reference mins over the mask-zeroed matrix (:227-229),
so its "closest negative" is identically 0 and the mode degenerates to
mean(relu(hardest_ap + margin)) (see the inline note; measured on a real
training run before the fix).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-9


def _masks(n_anchor: int, n_pos_per_anchor: int, use_anc_as_pos: bool):
    """Anchor-positive / anchor-negative masks (reference :95-114)."""
    n_pos = n_anchor * n_pos_per_anchor
    n_cols = n_pos + (n_anchor if use_anc_as_pos else 0)
    ap = np.zeros((n_anchor, n_cols), np.float32)
    for a in range(n_anchor):
        ap[a, a * n_pos_per_anchor:(a + 1) * n_pos_per_anchor] = 1.0
    an = 1.0 - ap
    if use_anc_as_pos:
        an[:, n_pos:] = 1.0 - np.eye(n_anchor, dtype=np.float32)
    return ap, an


@partial(jax.jit, static_argnames=("n_anchor", "n_pos_per_anchor",
                                   "use_anc_as_pos", "mode", "squared"))
def online_triplet_loss(emb_anchor: jax.Array,
                        emb_pos: jax.Array,
                        n_anchor: int,
                        n_pos_per_anchor: int,
                        margin: float = 0.5,
                        mode: str = "semi-hard",
                        use_anc_as_pos: bool = True,
                        squared: bool = False
                        ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (loss, pairwise_dist, num_active_triplets)."""
    ap_mask_np, an_mask_np = _masks(n_anchor, n_pos_per_anchor, use_anc_as_pos)
    ap_mask = jnp.asarray(ap_mask_np)
    an_mask = jnp.asarray(an_mask_np)

    cols = jnp.concatenate([emb_pos, emb_anchor], axis=0) if use_anc_as_pos \
        else emb_pos
    dots = jnp.dot(emb_anchor.astype(jnp.float32), cols.T.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    dists = 2.0 * (1.0 - dots)
    if not squared:
        pos = (dists > 0.0).astype(jnp.float32)
        dists = jnp.sqrt(dists * pos + EPS)

    ap_d = dists * ap_mask
    if mode == "all":
        per_elem = jnp.maximum(ap_d - dists * an_mask + margin, 0.0)
        loss = jnp.mean(per_elem)
    elif mode == "all-balanced":
        n_ap = ap_mask.sum(axis=1)
        n_an = an_mask.sum(axis=1)
        ap_row = ap_d.sum(axis=1) / n_ap
        an_row = (dists * an_mask).sum(axis=1) / n_an
        per_elem = jnp.maximum(ap_row - an_row + margin, 0.0)
        loss = jnp.mean(per_elem)
    elif mode == "hardest":
        # Deliberate fix #2: the reference takes min over the mask-ZEROED
        # matrix (:227-229), so the masked entries (value 0) always win and
        # the "closest negative" is identically 0 — its hardest mode reduces
        # to mean(relu(hardest_ap + margin)), which only pulls positives
        # together and pins the loss at exactly `margin` once they collapse
        # (measured: tr_loss = 0.5000 for 10 epochs on the synthetic corpus).
        # Mask by +inf instead so the min picks a real negative.
        an_row = jnp.min(jnp.where(an_mask > 0, dists, jnp.inf), axis=1)
        ap_row = jnp.max(ap_d, axis=1)
        per_elem = jnp.maximum(ap_row - an_row + margin, 0.0)
        loss = jnp.mean(per_elem)
    elif mode == "semi-hard":
        hardest_ap = jnp.max(ap_d, axis=1, keepdims=True)
        per_elem = jnp.maximum((hardest_ap - dists + margin) * an_mask, 0.0)
        loss = jnp.mean(per_elem)
    else:
        raise NotImplementedError(mode)

    num_active = jnp.sum((per_elem > 0.0).astype(jnp.float32))
    return loss, dists, num_active
