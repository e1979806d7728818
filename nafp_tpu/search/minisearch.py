"""In-memory mini-search used for validation during training.

Counterpart of the reference ``mini_search_subroutines.py:30-236``. The
reference scores multi-segment sequences by convolving the pairwise
distance matrix with an identity kernel ("conv_eye", :93-120) — i.e. a
diagonal-band sum. Here that is ``sum_k dists[:, q+k, d+k]`` over k<scope:
a handful of shifted adds XLA fuses, no conv machinery.

Inputs follow the reference convention: query ``(nQ, nAug, d)``, db
``(nD, d)``; modes 'argmin' (squared L2) and 'argmax' (inner product).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_distances(query: jax.Array, db: jax.Array,
                       return_dotprod: bool = False,
                       squared: bool = True) -> jax.Array:
    """(nAug, nQ, nD) distance/similarity tensor (reference :30-90)."""
    dot = jnp.einsum("qad,nd->aqn", query, db,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    if return_dotprod:
        return dot
    q_sq = jnp.sum(query ** 2, axis=2).T[:, :, None]    # (nAug, nQ, 1)
    d_sq = jnp.sum(db ** 2, axis=1)[None, None, :]      # (1, 1, nD)
    dists = jnp.maximum(q_sq + d_sq - 2.0 * dot, 0.0)
    if not squared:
        dists = jnp.sqrt(dists + 1e-16)
    return dists


def conv_eye(x: jax.Array, scope: int) -> jax.Array:
    """Diagonal-band sum: out[a,q,n] = sum_{k<scope} x[a, q+k, n+k]
    (the reference's identity-kernel Conv2D, :93-120)."""
    _, nq, nd = x.shape
    acc = x[:, :nq - scope + 1, :nd - scope + 1]
    for k in range(1, scope):
        acc = acc + x[:, k:nq - scope + 1 + k, k:nd - scope + 1 + k]
    return acc


@functools.partial(jax.jit, static_argnames=("scope", "sign", "gt_id_offset"))
def _ranks_for_scope(all_d: jax.Array, scope: int, sign: float,
                     gt_id_offset: int) -> jax.Array:
    """Rank of the ground-truth db row per (aug, target), entirely on
    device: rank = #(strictly better) + #(ties other than gt itself) — no
    argsort, no per-target host loop (the reference scans
    ``np.where(order == gt)`` per target, O(nQ·nD) Python work if
    max_n_samples is raised). Ties count AGAINST the gt: a collapsed model
    (all embeddings identical — the SpecAug failure mode in CLAUDE.md)
    must read as ~0 % top-1 in the in-training monitor, not 100 %."""
    d = conv_eye(all_d, scope) * sign
    n_targets = d.shape[1]
    gt = jnp.arange(n_targets) + gt_id_offset                # (nQ',)
    d_gt = jnp.take_along_axis(d, gt[None, :, None], axis=2)  # (nAug,nQ',1)
    return (jnp.sum(d < d_gt, axis=2)
            + jnp.sum(d == d_gt, axis=2) - 1)                 # (nAug, nQ')


def mini_search_eval(query: jax.Array,
                     db: jax.Array,
                     scopes: Sequence[int] = (1, 3, 5, 9, 11, 19),
                     mode: str = "argmin",
                     display: bool = True,
                     gt_id_offset: int = 0
                     ) -> Tuple[Tuple[np.ndarray, np.ndarray, np.ndarray],
                                np.ndarray]:
    """Returns ((top1, top3, top10) accuracies %, mean_rank) per scope
    (reference :123-236). Ground truth: query i matches db row i."""
    if mode == "argmin":
        all_d = pairwise_distances(query, db, squared=True)
        sign = 1.0
    elif mode.lower() == "argmax":
        all_d = pairwise_distances(query, db, return_dotprod=True)
        sign = -1.0  # larger is better -> negate for unified argsort
    else:
        raise NotImplementedError(mode)

    n_augs = query.shape[1]
    n_scopes = len(scopes)
    top1 = np.zeros(n_scopes)
    top3 = np.zeros(n_scopes)
    top10 = np.zeros(n_scopes)
    mean_rank = np.zeros(n_scopes)

    for i, s in enumerate(scopes):
        ranks = np.asarray(_ranks_for_scope(all_d, int(s), sign,
                                            int(gt_id_offset)))
        mean_rank[i] = ranks.mean()
        top1[i] = (ranks < 1).mean()
        top3[i] = (ranks < 3).mean()
        top10[i] = (ranks < 10).mean()
    top1, top3, top10 = top1 * 100, top3 * 100, top10 * 100

    if display:
        cyan, reset = "\033[36m", "\033[0m"
        print(cyan + "Scope:\t" + "\t".join(f"{s:^6}" for s in scopes) + reset)
        print(cyan + "T1acc:\t" + reset +
              "\t".join(f"{v:>4.2f}" for v in top1))
        print(cyan + "mRank:\t" + reset +
              "\t".join(f"{v:>4.2f}" for v in mean_rank))
    return (top1, top3, top10), mean_rank
