"""Fused similarity + top-k Pallas kernel for flat and decoded-PQ search.

The XLA flat path (``FlatIndex``) computes ``Q @ DBᵀ`` then ``lax.top_k``,
which materializes the (Bq, N) similarity matrix in HBM — at retrieval
scale (N ≈ 0.6-53 M, Bq ≈ 0.5-2 K) that is gigabytes of HBM traffic
dwarfing the matmul itself. This kernel streams DB row-blocks through
VMEM, does the (Bq, BLK) matmul on the MXU, and maintains a running
per-query top-k in a VMEM scratch — the full similarity matrix never
exists.

Selection strategy (v3): Mosaic has no ``top_k`` primitive, and the v1
kernel ran k rounds of (max, argmax, mask) over every tile — ~10·k VPU ops
per element, which lost to XLA below ~1 M rows. Once the running set is
warm almost no tile contributes (expected insertions over a whole scan
are k·H(n_tiles) ≈ k·ln(n_tiles) total per query), so the merge handles
the per-row best candidate straight-line (max, argmax, conditional
insert) and enters a (max, argmax, insert, mask) ``while_loop`` only when
some row has a second in-tile candidate — see ``_merge_tile``. The v2
filter-then-while form (2 extra full-tile VPU passes per tile) measured
84.2 ms vs v3's 58.1 ms @ 8.4 M rows on v5e (bench: extras/
bench_sq8_kernel.py; MXU+stream floor 27.8 ms).

Masking plumbing (Mosaic block shapes must be (8, 128)-tiled):
  - per-ROW validity rides as an additive f32 mask shaped
    ``(N/128, 128)`` — each DB tile reads a ``(blk/128, 128)`` block and
    adds row t's 128 lanes onto the matching column range;
  - the per-(query, subtile) probe bias (IVF-PQ) arrives TRANSPOSED as
    ``(n_subtiles, Bq)`` and is expanded to (Bq, blk) inside the kernel by
    one tiny MXU contraction against an iota-built 0/1 expansion matrix —
    no (Bq, sub) block ever exists.
  - the kernel reports *positions* (row indices into the scanned array);
    wrappers map positions to caller ids outside.

Inner-product metric only (fingerprints are L2-normalized, so IP ranking
== L2 ranking; reference uses IndexFlatL2, get_index_faiss.py:57).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _merge_tile(sim, base, best_v, best_i):
    """Merge a (Bq, BLK) score tile into the running per-query top-k held
    in the (Bq, k) VMEM scratch refs.

    v3 (hoisted first insert): the v2 filter-then-while form cost a full
    (Bq, BLK) candidate copy + an any-reduce before the loop even started
    — ~2 extra VPU passes on EVERY tile, while expected insertions per
    tile are ≈ Bq·k·ln(n_tiles)/n_tiles ≪ Bq (most rows insert 0-1
    candidates). v3 handles the per-row best candidate straight-line
    (max, argmax, conditional insert), then enters the while_loop only
    when some row still has a SECOND in-tile candidate above its new
    worst. Measured on v5e @ 8.4 M × 128, bq 512, k 20: 84.2 ms (v2) →
    58.1 ms (v3), ids bit-identical; MXU+stream floor 27.8 ms
    (extras/bench_sq8_kernel.py)."""
    bv, bi = best_v[:], best_i[:]
    w = jnp.min(bv, axis=1, keepdims=True)                   # (Bq, 1)

    m = jnp.max(sim, axis=1, keepdims=True)                  # (Bq, 1)
    am = jnp.argmax(sim, axis=1, keepdims=True)
    take = m > w
    pos = (am + base).astype(jnp.int32)
    wi = jnp.argmin(bv, axis=1, keepdims=True)
    slot = jax.lax.broadcasted_iota(jnp.int32, bv.shape, 1) == wi
    bv = jnp.where(slot & take, m, bv)
    bi = jnp.where(slot & take, pos, bi)

    # residual: any row with a 2nd candidate above its (updated) worst?
    hit = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) == am
    sim2 = jnp.where(hit & take, NEG, sim)
    w2 = jnp.min(bv, axis=1, keepdims=True)

    def residual(args):
        cand, bv, bi = args
        cand = jnp.where(cand > jnp.min(bv, axis=1, keepdims=True),
                         cand, NEG)

        def has_candidates(carry):
            cand, _, _ = carry
            return jnp.any(cand > NEG / 2)

        def insert_one(carry):
            cand, bv, bi = carry
            m = jnp.max(cand, axis=1, keepdims=True)         # (Bq, 1)
            am = jnp.argmax(cand, axis=1, keepdims=True)
            hit = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1) == am
            cand_pos = (am + base).astype(jnp.int32)
            cand = jnp.where(hit, NEG, cand)
            # replace the current worst entry if the candidate beats it
            wv = jnp.min(bv, axis=1, keepdims=True)
            wi = jnp.argmin(bv, axis=1, keepdims=True)
            take = m > wv
            slot = jax.lax.broadcasted_iota(jnp.int32, bv.shape, 1) == wi
            bv = jnp.where(slot & take, m, bv)
            bi = jnp.where(slot & take, cand_pos, bi)
            return (cand, bv, bi)

        _, bv, bi = jax.lax.while_loop(has_candidates, insert_one,
                                       (cand, bv, bi))
        return bv, bi

    bv, bi = jax.lax.cond(jnp.any(sim2 > w2), residual,
                          lambda args: (args[1], args[2]), (sim2, bv, bi))
    best_v[:] = bv
    best_i[:] = bi


def _finish_sort(best_v, best_i, out_v_ref, out_i_ref, k: int):
    """Sort the k running entries descending (k is tiny: selection sort)."""
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


def _kernel_body(q_ref, db_ref, rmask_ref, bias_ref, out_v_ref, out_i_ref,
                 best_v, best_i, *, k: int, blk: int, lt: int):
    j = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        best_v[:] = jnp.full_like(best_v, NEG)
        best_i[:] = jnp.full_like(best_i, -1)

    # (Bq, BLK) similarity tile on the MXU.
    sim = jnp.dot(q_ref[:], db_ref[:].T, preferred_element_type=jnp.float32)

    # additive per-row validity mask: row t of the (blk/128, 128) block
    # covers sim columns [t*128, (t+1)*128)
    rm = rmask_ref[:]
    parts = [sim[:, t * 128:(t + 1) * 128] + rm[t:t + 1, :]
             for t in range(blk // 128)]
    sim = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    if bias_ref is not None:
        # expand the transposed (sub, Bq) bias to (Bq, blk) with one MXU
        # contraction: E[s, c] = 1 iff column c lies in subtile s
        sub = blk // lt
        bt = bias_ref[:]                                     # (sub, Bq)
        rows = jax.lax.broadcasted_iota(jnp.int32, (sub, blk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sub, blk), 1)
        expand = (cols // lt == rows).astype(jnp.float32)    # (sub, blk)
        sim = sim + jax.lax.dot_general(
            bt, expand, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (Bq, blk)

    _merge_tile(sim, j * blk, best_v, best_i)

    @pl.when(j == n_blocks - 1)
    def _finish():
        _finish_sort(best_v, best_i, out_v_ref, out_i_ref, k)


def _kernel_plain(q_ref, db_ref, rmask_ref, out_v_ref, out_i_ref,
                  best_v, best_i, *, k, blk):
    _kernel_body(q_ref, db_ref, rmask_ref, None, out_v_ref, out_i_ref,
                 best_v, best_i, k=k, blk=blk, lt=blk)


def _kernel_masked(q_ref, db_ref, rmask_ref, bias_ref, out_v_ref, out_i_ref,
                   best_v, best_i, *, k, blk, lt):
    _kernel_body(q_ref, db_ref, rmask_ref, bias_ref, out_v_ref, out_i_ref,
                 best_v, best_i, k=k, blk=blk, lt=lt)


def _call(q, db, rmask, bias_t, *, k, blk, lt, interpret):
    n_pad, d = db.shape
    bq = q.shape[0]
    n_blocks = n_pad // blk
    dtype = db.dtype
    in_specs = [
        pl.BlockSpec((bq, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk // 128, 128), lambda j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q.astype(dtype), db, rmask]
    if bias_t is not None:
        kern = functools.partial(_kernel_masked, k=k, blk=blk, lt=lt)
        in_specs.append(pl.BlockSpec((blk // lt, bq), lambda j: (j, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_t)
    else:
        kern = functools.partial(_kernel_plain, k=k, blk=blk)

    # Scoped-VMEM budget, same treatment the sq8 kernel got in r4: the
    # kernel holds TWO (Bq, BLK) f32 buffers (sim tile + the merge's
    # masked candidate copy; the masked variant adds the bias expansion)
    # plus pipelined input blocks — a 512x2048 plain tile measured
    # 16.59 MB scoped against Mosaic's 16 MB default (grid-length-
    # dependent pipelining: the same tile compiled at 50 grid steps and
    # overflowed at 64+, i.e. DBs past ~128 k rows). v5e has 128 MB
    # physical VMEM; raise the limit to 6x the sim tile, never below the
    # 16 MB default, capped well under physical.
    tile = bq * blk * 4
    vmem_limit = min(100 * 2**20, max(16 * 2**20, 6 * tile))
    out_v, out_i = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=in_specs,
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
            flops=2 * bq * n_pad * d,
            bytes_accessed=n_pad * d * dtype.itemsize + bq * d * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*args)
    out_i = jnp.where(out_v <= NEG / 2, -1, out_i)
    return out_v, out_i


@functools.partial(jax.jit, static_argnames=("k", "blk", "interpret"))
def topk_ip_pallas(q: jax.Array, db: jax.Array, k: int = 32,
                   blk: int = 2048, interpret: bool = False):
    """Exact top-k inner-product search: returns (scores, ids), (Bq, k).

    q: (Bq, d) float32; db: (N, d) — N is padded up to a multiple of blk
    internally (pad rows masked, id -1). k should be small (<= 128: the
    running set lives in VMEM lanes). blk must be a multiple of 1024 on
    real TPU (the row-mask block is (blk/128, 128), sublane-tiled by 8).
    """
    n, d = db.shape
    # VMEM budget: TWO (Bq, BLK) f32 buffers coexist (the sim tile and the
    # merge's masked candidate copy carried through the while_loop), plus
    # double-buffered input blocks — a 1024x2048 tile measured 21.2 MB of
    # scoped vmem against the 16 MB limit, so cap the tile at 4 MB
    assert q.shape[0] * blk * 4 <= 4 * 2**20, \
        f"sim tile {q.shape[0]}x{blk} too large for VMEM; block the queries"
    n_pad_to = (-n) % blk
    if n_pad_to:
        db = jnp.pad(db, ((0, n_pad_to), (0, 0)))
    n_pad = n + n_pad_to
    rmask = jnp.where(jnp.arange(n_pad) < n, 0.0, NEG).astype(jnp.float32)
    return _call(q.astype(jnp.float32), db.astype(jnp.float32),
                 rmask.reshape(n_pad // 128, 128), None,
                 k=k, blk=blk, lt=blk, interpret=interpret)


def _kernel_sq8(q_ref, db_ref, scale_ref, rmask_ref, out_v_ref, out_i_ref,
                best_v, best_i, *, k: int, blk: int, ct):
    """Int8-store tile: dequantize on the fly (convert + per-row scale),
    one fused VPU chain with the validity mask, then the shared merge."""
    j = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        best_v[:] = jnp.full_like(best_v, NEG)
        best_i[:] = jnp.full_like(best_i, -1)

    # (Bq, BLK) int8-decoded similarity tile on the MXU. The int8 block
    # converts to the compute dtype in VMEM (blk*d elements — tiny next to
    # the (Bq, blk) sim tile the VPU chain below touches anyway).
    sim = jnp.dot(q_ref[:], db_ref[:].astype(ct).T,
                  preferred_element_type=jnp.float32)

    # per-DB-row scale (multiplicative) + validity mask (additive): row t
    # of each (blk/128, 128) block covers sim columns [t*128, (t+1)*128)
    sc, rm = scale_ref[:], rmask_ref[:]
    parts = [sim[:, t * 128:(t + 1) * 128] * sc[t:t + 1, :] + rm[t:t + 1, :]
             for t in range(blk // 128)]
    sim = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    _merge_tile(sim, j * blk, best_v, best_i)

    @pl.when(j == n_blocks - 1)
    def _finish():
        _finish_sort(best_v, best_i, out_v_ref, out_i_ref, k)


@functools.partial(jax.jit, static_argnames=("k", "blk", "interpret"))
def topk_ip_sq8_pallas(q: jax.Array, vecs8: jax.Array, scales: jax.Array,
                       rmask: jax.Array, k: int = 20, blk: int = 2048,
                       interpret: bool = False):
    """Exact top-k inner product over an int8 store with per-row scales.

    q: (Bq, d) float32; vecs8: (N, d) int8 with N a multiple of ``blk``;
    scales: (N,) float32 (0 on padding rows); rmask: (N,) float32 additive
    validity (0 valid / NEG invalid — padding AND tombstones). Returns
    (scores, positions); positions are row indices into ``vecs8`` (callers
    map to their own ids), -1 where masked. The full (Bq, N) score matrix
    never exists: DB tiles stream HBM→VMEM, dequantize in-register, and
    merge into a (Bq, k) running set — the int8 store is 4× smaller than
    f32, so the whole 100×-protocol DB (53.6 M × 128 = 6.9 GB) scans from
    one chip's HBM at streaming rate. Replaces faiss's SQ8 flat scan
    (IndexScalarQuantizer), reference get_index_faiss.py:10-121.
    """
    n, d = vecs8.shape
    bq = q.shape[0]
    assert n % blk == 0 and blk % 1024 == 0, (n, blk)
    # Several (Bq, BLK) f32 buffers coexist (sim + the merge's masked
    # copies): a 1024x1024 tile measured 16.54 MB of scoped vmem against
    # Mosaic's 16 MB default, so tiles past 4 MB raise the kernel's
    # scoped-vmem limit instead (v5e has 128 MB physical VMEM; 6x the sim
    # tile covers the measured footprint with margin — 48 MB ran clean at
    # 1024x2048). Bigger query blocks amortize the HBM stream across more
    # queries: @ 8.4 M rows v5e, 512x2048 = 7,780 QPS, 1024x2048 = 9,880,
    # 2048x1024 = 10,040, 2048x2048 = 9,483 (same-day sweep, r4) —
    # 1024x2048 is the shipped default (near-plateau at half the latency
    # of 2048-query blocks).
    tile = bq * blk * 4
    assert tile <= 16 * 2**20, \
        f"sim tile {bq}x{blk} too large for VMEM; block the queries"
    vmem_limit = None if tile <= 4 * 2**20 else min(6 * tile, 100 * 2**20)
    # bf16 q on the MXU; CPU XLA (interpret-mode tests) can't do
    # bf16×bf16→f32 dots, so interpret computes in f32
    ct = jnp.float32 if interpret else jnp.bfloat16
    n_blocks = n // blk
    out_v, out_i = pl.pallas_call(
        functools.partial(_kernel_sq8, k=k, blk=blk, ct=ct),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bq, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk // 128, 128), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk // 128, 128), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bq, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((bq, k), jnp.float32),
                   jax.ShapeDtypeStruct((bq, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((bq, k), jnp.float32),
                        pltpu.VMEM((bq, k), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * n * d,
            bytes_accessed=n * d + bq * d * 4 + 2 * n * 4,
            transcendentals=0),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit) if vmem_limit else None),
        interpret=interpret,
    )(q.astype(ct), vecs8,
      scales.reshape(n // 128, 128), rmask.reshape(n // 128, 128))
    out_i = jnp.where(out_v <= NEG / 2, -1, out_i)
    return out_v, out_i


@functools.partial(jax.jit,
                   static_argnames=("k", "blk", "list_tile", "interpret"))
def topk_ip_pallas_masked(q: jax.Array, db: jax.Array, ids: jax.Array,
                          bias: jax.Array, k: int = 32, blk: int = 1024,
                          list_tile: int = 128, interpret: bool = False):
    """Top-k with per-row ids and per-(query, subtile) additive bias.

    q: (Bq, d); db: (N, d) with N a multiple of ``blk``; ids: (N,) int32,
    -1 marks invalid (padding) rows anywhere in the array; bias:
    (Bq, N // list_tile) float32 added to every score in the subtile
    (use 0 / NEG to implement inverted-list probe masks). On real TPU
    ``Bq`` must be a multiple of 128 (the transposed bias block is
    (blk/list_tile, Bq)), ``blk`` a multiple of 1024, and
    ``blk // list_tile`` a multiple of 8.
    """
    n, d = db.shape
    assert n % blk == 0 and blk % list_tile == 0
    # THREE (Bq, BLK) f32 buffers coexist here (sim, the bias-expansion
    # dot result, and the merge candidates): tighter cap than the plain
    # kernels (see the 21.2 MB vmem OOM note in topk_ip_pallas)
    assert q.shape[0] * blk * 4 <= 2 * 2**20, \
        f"sim tile {q.shape[0]}x{blk} too large for VMEM; block the queries"
    assert bias.shape == (q.shape[0], n // list_tile), bias.shape
    rmask = jnp.where(ids >= 0, 0.0, NEG).astype(jnp.float32)
    v, pos = _call(q, db, rmask.reshape(n // 128, 128),
                   bias.T.astype(jnp.float32),
                   k=k, blk=blk, lt=list_tile, interpret=interpret)
    out_ids = jnp.take(ids.astype(jnp.int32), jnp.maximum(pos, 0))
    return v, jnp.where(pos < 0, -1, out_ids)
