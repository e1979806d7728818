"""Fused similarity + top-k Pallas kernel for flat search.

The XLA flat path (``FlatIndex``) computes ``Q @ DBᵀ`` then ``lax.top_k``,
which materializes the (Bq, N) similarity matrix in HBM — at retrieval
scale (N ≈ 0.6 M, Bq ≈ 2 K) that is gigabytes of HBM traffic dwarfing the
matmul itself. This kernel streams DB row-blocks through VMEM, does the
(Bq, BLK) matmul on the MXU, and maintains a running per-query top-k in a
VMEM scratch — the full similarity matrix never exists.

Mosaic has no ``top_k`` primitive (checked), so selection is k rounds of
(max, argmax, mask) on the VPU per block: k·O(Bq·BLK) element ops against
the matmul's O(Bq·BLK·d) MACs — selection stays off the critical path for
d = 128.

Inner-product metric only (fingerprints are L2-normalized, so IP ranking ==
L2 ranking; reference uses IndexFlatL2, get_index_faiss.py:57).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, db_ref, out_v_ref, out_i_ref, best_v, best_i, *, k: int,
            blk: int, n: int):
    j = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        best_v[:] = jnp.full_like(best_v, NEG)
        best_i[:] = jnp.full_like(best_i, -1)

    # (Bq, BLK) similarity tile on the MXU.
    sim = jnp.dot(q_ref[:], db_ref[:].T, preferred_element_type=jnp.float32)
    base = j * blk
    # pad rows (beyond the true N) must never win
    col_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) + base
    sim = jnp.where(col_ids < n, sim, NEG)

    def select_one(_, carry):
        sim, bv, bi = carry
        # best remaining candidate in this tile, per query row
        m = jnp.max(sim, axis=1, keepdims=True)              # (Bq, 1)
        am = jnp.argmax(sim, axis=1, keepdims=True)          # (Bq, 1)
        cand_id = (am + base).astype(jnp.int32)
        # knock it out of the tile
        hit = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) == am
        sim = jnp.where(hit, NEG, sim)
        # replace the current worst running entry if the candidate beats it
        wv = jnp.min(bv, axis=1, keepdims=True)              # (Bq, 1)
        wi = jnp.argmin(bv, axis=1, keepdims=True)
        take = m > wv                                        # (Bq, 1)
        slot = jax.lax.broadcasted_iota(jnp.int32, bv.shape, 1) == wi
        bv = jnp.where(slot & take, m, bv)
        bi = jnp.where(slot & take, cand_id, bi)
        return (sim, bv, bi)

    sim, bv, bi = jax.lax.fori_loop(0, k, select_one,
                                    (sim, best_v[:], best_i[:]))
    del sim
    best_v[:] = bv
    best_i[:] = bi

    @pl.when(j == n_blocks - 1)
    def _finish():
        # sort the k running entries descending (k is tiny: selection sort)
        def order_one(pos, carry):
            bv, bi, ov, oi = carry
            m = jnp.max(bv, axis=1, keepdims=True)
            am = jnp.argmax(bv, axis=1, keepdims=True)
            hit = jax.lax.broadcasted_iota(jnp.int32, bv.shape, 1) == am
            # one-hot row-select (Mosaic lacks this gather shape)
            ids = jnp.sum(jnp.where(hit, bi, 0), axis=1, keepdims=True)
            bv = jnp.where(hit, NEG, bv)
            here = jax.lax.broadcasted_iota(jnp.int32, ov.shape, 1) == pos
            ov = jnp.where(here, m, ov)
            oi = jnp.where(here, ids, oi)
            return (bv, bi, ov, oi)

        init = (best_v[:], best_i[:], jnp.zeros_like(best_v),
                jnp.zeros_like(best_i))
        _, _, ov, oi = jax.lax.fori_loop(0, k, order_one, init)
        out_v_ref[:] = ov
        out_i_ref[:] = oi


@functools.partial(jax.jit, static_argnames=("k", "blk", "interpret"))
def topk_ip_pallas(q: jax.Array, db: jax.Array, k: int = 32,
                   blk: int = 2048, interpret: bool = False):
    """Top-k inner-product search: returns (scores, ids), each (Bq, k).

    q: (Bq, d) float32; db: (N, d) — N is padded up to a multiple of blk
    internally (pad rows score NEG). k must be a multiple of-nothing but
    small (<= 128 recommended: the running set lives in VMEM lanes).
    """
    n, d = db.shape
    # VMEM budget: the (Bq, BLK) f32 sim tile is the big resident
    assert q.shape[0] * blk * 4 <= 8 * 2**20, \
        f"sim tile {q.shape[0]}x{blk} too large for VMEM; block the queries"
    n_pad = (-n) % blk
    if n_pad:
        db = jnp.pad(db, ((0, n_pad), (0, 0)))
        # pad rows are zero vectors -> score 0; mask by id at the end
    n_blocks = (n + n_pad) // blk
    bq = q.shape[0]

    out_v, out_i = pl.pallas_call(
        functools.partial(_kernel, k=k, blk=blk, n=n),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bq, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bq, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((bq, k), jnp.float32),
                   jax.ShapeDtypeStruct((bq, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((bq, k), jnp.float32),
                        pltpu.VMEM((bq, k), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * (n + n_pad) * d,
            bytes_accessed=(n + n_pad) * d * 4 + bq * d * 4,
            transcendentals=0),
        interpret=interpret,
    )(q.astype(jnp.float32), db.astype(jnp.float32))
    # entries never filled (k > n) keep id -1
    out_i = jnp.where(out_v <= NEG / 2, -1, out_i)
    return out_v, out_i
