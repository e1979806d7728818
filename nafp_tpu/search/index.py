"""On-TPU vector indexes: exact flat search, k-means, IVF-PQ.

TPU-native replacement for the FAISS backend
(``eval/utils/get_index_faiss.py:10-121``). Design stance: the MXU makes
brute-force matmul search extremely fast at the reference's scale
(~0.6 M vectors), so the *exact* path is a blocked ``Q @ DBᵀ`` +
``lax.top_k`` — no ANN machinery, perfect recall. Compression for the
100× database (53.6 M vectors, 27 GB fp32) comes from IVF-PQ with the
reference's parameters (nlist 256, M=64 subquantizers × 8 bits, nprobe 40;
``get_index_faiss.py:69-74,120``), trained by Lloyd k-means that is itself
just matmuls.

All fingerprints are L2-normalized, so L2 ranking == inner-product ranking;
both metrics are exposed ('l2' matches the reference's IndexFlatL2).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nafp_tpu.utils.device import _update_rows, chunked_device_put


# ---------------------------------------------------------------------------
# Exact flat index
# ---------------------------------------------------------------------------
class FlatIndex:
    """Exact search over a device-resident (N, d) matrix.

    ``search`` blocks over query rows; each block is one MXU matmul over
    the whole DB followed by ``lax.top_k``.
    """

    def __init__(self, db: np.ndarray, metric: str = "l2",
                 dtype=jnp.float32):
        assert metric in ("l2", "ip")
        self.metric = metric
        db_host = np.asarray(db, np.float32)
        self.db = jnp.asarray(db_host, dtype)
        # host copy of the row norms: the fused-kernel l2 path converts its
        # IP scores back to L2^2 with a k-sized host gather (re-fetching the
        # device (N,) array per search call would ship it through the slow
        # link every time)
        self._db_sq_host = np.einsum("nd,nd->n", db_host, db_host)
        self.db_sq = jnp.asarray(self._db_sq_host)
        self.ntotal = self.db.shape[0]
        # On equal-norm rows (all fingerprints are L2-normalized) L2 ranking
        # == IP ranking, so the 'l2' metric can ride the fused Pallas kernel
        # too — without this, the XLA path's (Bq, N) f32 logits tensor is an
        # HBM OOM at the reference's standard mini protocol (~5.9 M rows
        # x 2048-query block = 48 GB). Any shared norm qualifies (the L2^2
        # conversion gathers per-row db_sq anyway), so no `initial=` — it
        # would participate in the reduction and reject e.g. all-norm-2 DBs.
        # Relative tolerance: f32-normalized rows sit at ~1e-7 relative
        # spread; an absolute cutoff would silently re-rank near-but-not-
        # equal-norm DBs (fp16-roundtripped, dequantized) by IP while the
        # class promises exact L2.
        if self.ntotal:
            mx = float(self._db_sq_host.max())
            spread = mx - float(self._db_sq_host.min())
            self._unit_norm = spread <= 1e-5 * max(abs(mx), 1e-12)
        else:
            self._unit_norm = True

    # NOTE for every index here: device arrays are passed as jit ARGUMENTS,
    # never accessed via a static `self` — a static self bakes the whole DB
    # into the program as a constant (hundreds of MB of compile payload,
    # rejected by the remote compiler, and no executable reuse across DBs).
    @staticmethod
    @functools.partial(jax.jit, static_argnames=("k", "metric"))
    def _search_block_impl(q, db, db_sq, k: int, metric: str):
        sim = jnp.dot(q.astype(db.dtype), db.T,
                      preferred_element_type=jnp.float32)
        if metric == "l2":
            # ||q-x||^2 = ||q||^2 + ||x||^2 - 2 q·x ; ||q||^2 is rank-const
            score = 2.0 * sim - db_sq[None, :]
            d, ids = jax.lax.top_k(score, k)
            q_sq = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
            return q_sq - d, ids  # actual L2^2 distances
        d, ids = jax.lax.top_k(sim, k)
        return d, ids

    def _search_block(self, q: jax.Array, k: int):
        return self._search_block_impl(q, self.db, self.db_sq, k, self.metric)

    # Above this, every search on this DB uses the fused Pallas kernel that
    # streams DB tiles and never materializes the (Bq, N) logits
    # (search/pallas_topk.py). The v2 filtered selection beats XLA's
    # matmul+TopK well below the old 1M crossover (measured on v5e,
    # 512 queries x 128d, k=20: 59 vs 89 ms at 150k rows, 61 vs 102 ms at
    # 620k). Below ~50k both paths are host-overhead-bound; XLA avoids a
    # per-shape Mosaic compile there. The decision is per-DB, not
    # per-call: mixing paths compiles an XLA TopK program over the full N
    # for small warm-up batches, which the remote compiler chokes on at
    # large N.
    PALLAS_MIN_ROWS = 50_000
    # XLA-path HBM guard: the (block, N) f32 logits tensor of one search
    # block must stay under this budget (v5e has 16 GB HBM which also holds
    # the f32 DB itself). The fused kernel never materializes logits, so
    # this only bounds the fallback (non-TPU backends / non-equal-norm l2).
    XLA_LOGITS_BUDGET = 1 << 30

    def _xla_block_cap(self, block: int) -> int:
        """Largest query-block size whose (block, N) f32 logits tensor fits
        XLA_LOGITS_BUDGET (>= 1 so search always makes progress)."""
        if self.ntotal == 0:
            return block
        return max(1, min(block, self.XLA_LOGITS_BUDGET // (4 * self.ntotal)))

    def _use_fused(self) -> bool:
        """Route through the fused Pallas kernel: TPU backend, enough rows
        to beat XLA (see PALLAS_MIN_ROWS note), and an IP-rankable metric —
        'ip' always; 'l2' when all rows share one norm (then
        ||q-x||^2 = q^2 + c - 2 q.x is a monotone flip of q.x, and the
        true L2^2 values are recovered from the kernel's IP scores)."""
        if jax.default_backend() != "tpu" and not getattr(
                self, "force_interpret_fused", False):
            return False
        if self.ntotal < self.PALLAS_MIN_ROWS and not getattr(
                self, "force_interpret_fused", False):
            return False
        return self.metric == "ip" or self._unit_norm

    def search(self, q: np.ndarray, k: int,
               block: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(q, np.float32)
        use_pallas = self._use_fused()
        if use_pallas:
            from nafp_tpu.search.pallas_topk import topk_ip_pallas
            block = min(block, 512)  # VMEM sim-tile budget
            interpret = jax.default_backend() != "tpu"
        else:
            block = self._xla_block_cap(block)
        outs_d, outs_i = [], []
        for s in range(0, len(q), block):
            blk = q[s:s + block]
            pad = 0
            if len(blk) < min(block, len(q)) and len(q) > block:
                pad = block - len(blk)
                blk = np.pad(blk, ((0, pad), (0, 0)))
            if use_pallas:
                d, ids = topk_ip_pallas(jnp.asarray(blk),
                                        self.db.astype(jnp.float32), k=k,
                                        interpret=interpret)
                if self.metric == "l2":
                    # IP -> L2^2 on the k-sized result (host gather)
                    d_np, ids_np = np.asarray(d), np.asarray(ids)
                    q_sq = np.einsum("nd,nd->n", blk, blk)
                    d = (q_sq[:, None]
                         + self._db_sq_host[np.maximum(ids_np, 0)]
                         - 2.0 * d_np)
                    ids = ids_np
            else:
                d, ids = self._search_block(jnp.asarray(blk), k)
            n = len(blk) - pad
            outs_d.append(np.asarray(d[:n]))
            outs_i.append(np.asarray(ids[:n]))
        return np.concatenate(outs_d), np.concatenate(outs_i)


# ---------------------------------------------------------------------------
# Exact int8 flat index (full-scan Pallas kernel)
# ---------------------------------------------------------------------------
def _pad_sq8_store(q8, scales, ids, multiple: int):
    """Repad a quantized store to a row multiple. THE single owner of the
    pad-row contract (zero vectors, scale 0, id -1 — the kernels mask on
    id < 0): quantize, single-device load, and sharded publish all repad
    through here, so a contract change cannot desynchronize them."""
    extra = (-len(q8)) % multiple
    if extra:
        d = q8.shape[1]
        q8 = np.concatenate([q8, np.zeros((extra, d), np.int8)])
        scales = np.concatenate([scales, np.zeros(extra, np.float32)])
        ids = np.concatenate([ids, np.full(extra, -1, np.int32)])
    return q8, scales, ids


def _quantize_sq8_host(data, pad_multiple: int, block: int = 1 << 20):
    """Host-side per-row int8 quantization of an array or disk memmap,
    padded to a multiple of ``pad_multiple`` rows (pad rows id -1 / scale
    0). Returns (q8, scales, ids) host arrays."""
    n, d = len(data), data.shape[1]
    pad = (-n) % pad_multiple
    q8 = np.zeros((n + pad, d), np.int8)
    scales = np.zeros(n + pad, np.float32)
    xbuf = np.empty((min(block, n), d), np.float32)   # warm reused buffer
    for s in range(0, n, block):
        e = min(s + block, n)
        x = xbuf[:e - s]
        x[:] = data[s:e]
        sc = np.maximum(np.abs(x).max(axis=1), 1e-12) / 127.0
        x /= sc[:, None]
        np.rint(x, out=x)
        np.clip(x, -127, 127, out=x)
        q8[s:e] = x
        scales[s:e] = sc
    ids = np.full(n + pad, -1, np.int32)
    ids[:n] = np.arange(n, dtype=np.int32)
    return q8, scales, ids


class SQ8FlatIndex:
    """Exact search over an int8-quantized device-resident store.

    The TPU-native answer to *large-scale exact* search: int8 + per-vector
    scale is 129 B/vec (4× smaller than f32), so the full 100×-protocol
    store (53.6 M × 128 = 6.9 GB) fits one chip's HBM, and the fused
    Pallas kernel (`topk_ip_sq8_pallas`) streams it tile-by-tile at HBM
    rate with an in-VMEM running top-k — full recall (int8 rounding only;
    top-1 agreement with f32 exact is ~100 % on L2-normalized
    fingerprints), no IVF training, no nprobe tuning.

    Why full scan instead of probing (measured, r3): a batched scan shares
    every HBM byte across the whole query block, while IVF probe gathers
    read nq × nprobe × list_cap rows — more traffic than the whole store
    for nq ≳ 8 at 100× scale. IVF-SQ8 remains the small-batch/low-latency
    option; this index is the throughput option AND removes the
    recall-vs-QPS tradeoff. Replaces faiss IndexScalarQuantizer/Flat
    (reference builds only IndexFlatL2, get_index_faiss.py:57; this keeps
    exact semantics at a scale faiss-flat could not hold in GPU RAM).
    """

    BLK = 2048          # kernel DB-tile rows; store is padded to a multiple

    def __init__(self, d: int = 128):
        self.d = d
        self.ntotal = 0
        self._trained = True    # no training stage (exact index)

    def train(self, data: np.ndarray, **_) -> None:  # factory-contract no-op
        self._trained = True

    def add(self, data, block: int = 1 << 20,
            persist_path: Optional[str] = None) -> None:
        """Quantize-and-ship: stream ``data`` (array or disk memmap)
        block-by-block, int8-quantize on the host, upload in bounded
        chunks. No coarse assignment, no sort — rows keep their order."""
        n = len(data)
        q8, scales, ids = _quantize_sq8_host(data, self.BLK, block)
        self.ntotal = n
        if persist_path:
            np.savez(persist_path, ntotal=n, vecs8=q8, scales=scales,
                     ids=ids)
        self._publish(q8, scales, ids)

    def _publish(self, q8: np.ndarray, scales: np.ndarray,
                 ids: np.ndarray) -> None:
        self.vecs8 = _chunked_device_put(q8)
        self.scales = _chunked_device_put(scales)
        self.ids = _chunked_device_put(ids)
        self.rmask = jnp.where(self.ids >= 0, 0.0, -1e30).astype(jnp.float32)

    @classmethod
    def load(cls, path: str) -> "SQ8FlatIndex":
        """Load a store persisted by ``add(persist_path=...)`` — or an
        IVF-SQ8 store npz (``IVFSQ8Index.add(persist_path=...)``): the
        sorted int8 rows + original-row ids are exactly what a full scan
        needs, so the hours-long 100×-scale quantize+ship can be reused
        across both index types."""
        z = np.load(path)
        q8, scales, ids = z["vecs8"], z["scales"], z["ids"]
        d = q8.shape[1]
        idx = cls(d=d)
        idx.ntotal = int(z["ntotal"])
        # IVF stores pad to list_cap, not BLK: repad
        idx._publish(*_pad_sq8_store(q8, scales, ids, cls.BLK))
        return idx

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("k", "interpret"))
    def _search_block(q, vecs8, scales, rmask, ids, k: int, interpret: bool):
        from nafp_tpu.search.pallas_topk import topk_ip_sq8_pallas
        v, pos = topk_ip_sq8_pallas(q, vecs8, scales, rmask, k=k,
                                    interpret=interpret)
        out = jnp.take(ids, jnp.maximum(pos, 0))
        return v, jnp.where(pos < 0, -1, out)

    def search(self, q: np.ndarray, k: int,
               block: int = 1024) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(q, np.float32)
        # the (block, BLK) f32 sim tile must fit the kernel's VMEM budget
        # (the kernel raises its scoped-vmem limit for tiles past 4 MB;
        # 1024x2048 measured 9,880 QPS vs 512x2048's 7,780 @ 8.4 M, r4)
        block = min(block, (16 << 20) // (self.BLK * 4))
        interpret = jax.default_backend() != "tpu"
        outs_d, outs_i = [], []
        for s in range(0, len(q), block):
            blk = q[s:s + block]
            pad = block - len(blk) if len(blk) < block and len(q) > block \
                else 0
            if pad:
                blk = np.pad(blk, ((0, pad), (0, 0)))
            d, ids = self._search_block(jnp.asarray(blk), self.vecs8,
                                        self.scales, self.rmask, self.ids,
                                        k, interpret)
            n = len(blk) - pad
            outs_d.append(np.asarray(d[:n]))
            outs_i.append(np.asarray(ids[:n]))
        return np.concatenate(outs_d), np.concatenate(outs_i)


# ---------------------------------------------------------------------------
# K-means (Lloyd iterations as matmuls)
# ---------------------------------------------------------------------------
def _kmeanspp_init(data: jax.Array, k: int, key: jax.Array) -> jax.Array:
    """k-means++ seeding: each next centroid sampled ∝ squared distance to
    the nearest chosen one (sequential scan, one matvec per step)."""
    n, d = data.shape
    k0, key = jax.random.split(key)
    first = data[jax.random.randint(k0, (), 0, n)]
    cents0 = jnp.zeros((k, d), data.dtype).at[0].set(first)
    d2_0 = jnp.sum((data - first) ** 2, axis=1)

    def body(i, carry):
        cents, d2, key = carry
        key, sub = jax.random.split(key)
        nxt = data[jax.random.categorical(sub, jnp.log(d2 + 1e-12))]
        cents = cents.at[i].set(nxt)
        d2 = jnp.minimum(d2, jnp.sum((data - nxt) ** 2, axis=1))
        return cents, d2, key

    cents, _, _ = jax.lax.fori_loop(1, k, body, (cents0, d2_0, key))
    return cents


@jax.jit
def _lloyd_accum(data: jax.Array, cents: jax.Array):
    """Partial Lloyd statistics for one data chunk: one-hot segment sums
    (MXU, no scatters) -> (sums (k, d), counts (k,)). Module-level jit so
    repeated kmeans() calls (the 64 PQ codebooks) reuse one executable."""
    k = cents.shape[0]
    c_sq = jnp.sum(cents ** 2, 1)
    sim = (2.0 * jnp.dot(data, cents.T, preferred_element_type=jnp.float32)
           - c_sq[None, :])
    assign = jnp.argmax(sim, axis=1)                        # (n,)
    onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)   # (n, k)
    sums = jnp.dot(onehot.T, data, preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    return sums, counts


def _lloyd_step(data: jax.Array, cents: jax.Array,
                block: Optional[int] = None) -> jax.Array:
    """One Lloyd iteration, blocked over the data so the (n, k) one-hot
    never exists at full size (k can be 4096+ for sqrt(N) coarse books)."""
    k, d = cents.shape
    n = data.shape[0]
    if block is None:
        # keep the per-block (block, k) one-hot around 1 GB f32
        block = max(8192, (1 << 28) // k)
    if n * k <= (1 << 28):                  # small: single fused call
        sums, counts = _lloyd_accum(data, cents)
    else:
        sums = jnp.zeros((k, d), jnp.float32)
        counts = jnp.zeros((k,), jnp.float32)
        nfull = (n // block) * block
        for s in range(0, nfull, block):
            ps, pc = _lloyd_accum(
                jax.lax.dynamic_slice_in_dim(data, s, block), cents)
            sums, counts = sums + ps, counts + pc
        if n > nfull:                        # one partial tail chunk
            ps, pc = _lloyd_accum(data[nfull:], cents)
            sums, counts = sums + ps, counts + pc
    counts = counts[:, None]
    new = sums / jnp.maximum(counts, 1.0)
    # keep empty clusters where they were
    return jnp.where(counts > 0, new, cents)


@jax.jit
def _assign_block(data: jax.Array, cents: jax.Array):
    c_sq = jnp.sum(cents ** 2, 1)
    sim = (2.0 * jnp.dot(data, cents.T, preferred_element_type=jnp.float32)
           - c_sq[None, :])
    return jnp.argmax(sim, axis=1).astype(jnp.int32)


@jax.jit
def _assign_int8_block(q8: jax.Array, scales: jax.Array, cents: jax.Array):
    """Nearest centroid of x = scale*q8: argmax_j 2*s*(q8·c_j) − |c_j|².
    Ships 132 B/row instead of 512 (int8 codes + f32 scale)."""
    c_sq = jnp.sum(cents ** 2, 1)
    # bf16 MXU dot on TPU; CPU XLA lacks bf16xbf16->f32, use f32 there
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    dots = jnp.dot(q8.astype(cdt), cents.T.astype(cdt),
                   preferred_element_type=jnp.float32)
    sim = 2.0 * scales[:, None] * dots - c_sq[None, :]
    return jnp.argmax(sim, axis=1).astype(jnp.int32)


def _assign_int8(q8: np.ndarray, scales: np.ndarray,
                 centroids: jax.Array) -> np.ndarray:
    """Host wrapper: int8-representation coarse assignment for one block."""
    return np.asarray(_assign_int8_block(jnp.asarray(q8),
                                         jnp.asarray(scales), centroids))


def assign_to_centroids(data: np.ndarray, centroids: jax.Array,
                        block: int = 262144) -> np.ndarray:
    """Blockwise device-side nearest-centroid assignment."""
    out = np.empty(len(data), np.int32)
    for s in range(0, len(data), block):
        blk = np.ascontiguousarray(data[s:s + block])
        pad = block - len(blk) if len(blk) < block and len(data) > block \
            else 0
        if pad:
            blk = np.pad(blk, ((0, pad), (0, 0)))
        a = np.asarray(_assign_block(jnp.asarray(blk), centroids))
        out[s:s + block] = a[:len(a) - pad] if pad else a
    return out


def _host_gemm(a: np.ndarray, b: np.ndarray,
               out: Optional[np.ndarray] = None) -> np.ndarray:
    """a @ b on the host. torch when available — this VM's numpy/OpenBLAS
    runs sgemm at ~0.4 GFLOPS (bad DYNAMIC_ARCH kernel) vs torch's ~30 —
    with a numpy fallback so the library never hard-requires torch.

    ``out``: REUSE this (C-contiguous f32) buffer for the product. On
    VMM-backed on-demand memory a fresh multi-GB output faults at
    ~1 ms/page (measured: 1 GB gemm output 79-191 s fresh vs ~2 s into a
    warm buffer), so every caller in a loop should pass one."""
    try:
        import torch
        ta = torch.from_numpy(np.ascontiguousarray(a))
        tb = torch.from_numpy(np.ascontiguousarray(b))
        if out is None:
            return (ta @ tb).numpy()
        torch.mm(ta, tb, out=torch.from_numpy(out))
        return out
    except ImportError:                                   # pragma: no cover
        return np.matmul(a, b, out=out)


def _host_assign_block(data: np.ndarray, cents: np.ndarray,
                       sim_out: Optional[np.ndarray] = None) -> np.ndarray:
    """Nearest centroid on the host: argmax 2·x·c − |c|² (same math as
    ``_assign_block`` without shipping f32 rows to the device)."""
    sim = _host_gemm(data, np.ascontiguousarray(cents.T), out=sim_out)
    sim *= 2.0
    sim -= np.sum(cents ** 2, 1)[None, :]
    return np.argmax(sim, axis=1).astype(np.int32)


def _host_pq_encode_block(resid: np.ndarray, books: np.ndarray,
                          sim_out: Optional[np.ndarray] = None) -> np.ndarray:
    """PQ-encode residuals on the host: per-subquantizer nearest codeword
    (same math as ``IVFPQIndex._encode_block``)."""
    n = len(resid)
    m, ksub, dsub = books.shape
    r = resid.reshape(n, m, dsub)
    codes = np.empty((n, m), np.uint8)
    b_sq = np.sum(books ** 2, -1)                        # (m, ksub)
    so = sim_out[:n] if sim_out is not None else None
    for mi in range(m):
        sim = _host_gemm(np.ascontiguousarray(r[:, mi]),
                         np.ascontiguousarray(books[mi].T), out=so)
        sim *= 2.0
        sim -= b_sq[mi][None, :]
        codes[:, mi] = np.argmax(sim, axis=1)
    return codes


def kmeans(data: jax.Array, k: int, iters: int = 10,
           key: Optional[jax.Array] = None) -> jax.Array:
    """Lloyd k-means on device with k-means++ init."""
    key = jax.random.PRNGKey(0) if key is None else key
    cents = jax.jit(_kmeanspp_init, static_argnums=1)(data, k, key)
    for _ in range(iters):
        cents = _lloyd_step(data, cents)
    return cents


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------
class IVFPQIndex:
    """IVF-PQ re-designed for the MXU: decode-and-matmul instead of ADC
    lookup tables.

    FAISS scans PQ codes with per-query LUT lookups (asymmetric distance,
    ``q·c + Σ_m LUT_m[code_m]``) — a per-element gather per (query, row,
    subquantizer) that is hostile to TPUs (measured 3.2 QPS at 2 M rows in
    round 1). The observation: the identical score is ``q · decode(x)``
    with ``decode(x) = c + Σ_m codebook_m[code_m]``, and decoding is
    *shared across every query in the block*. So the search decodes code
    tiles once (one-hot × codebook einsums — pure MXU work, amortized over
    the query block), scores them with a plain ``Q @ decodedᵀ`` matmul,
    and enforces the IVF probe set with an additive 0/−inf bias per
    (query, subtile) — each LIST_TILE-row subtile belongs to exactly one
    inverted list by construction. On TPU the decode feeds the fused
    Pallas top-k kernel (``pallas_topk.topk_ip_pallas_masked``) so the
    (Bq, N) score matrix never exists; elsewhere an XLA top_k fallback
    runs the same math.

    Storage stays at PQ compression: codes (N, m=64) uint8 = 64 B/vector
    with the reference's parameters (nlist 256, 64×8-bit subquantizers,
    nprobe 40; ``get_index_faiss.py:69-74,120``); decoded tiles are
    transient.

    refine (ivfpq-rr): keep the raw vectors and rescore the top candidates
    exactly, like FAISS IndexIVFPQR's refinement stage
    (``get_index_faiss.py:77-83``) — here exact f32 instead of 4-bit PQ.
    """

    LIST_TILE = 128   # rows per single-list subtile (probe-mask granularity)
    BLK = 1024        # pallas kernel DB tile (multiple of LIST_TILE; the
                      # kernel wants BLK % 1024 == 0 and BLK/LIST_TILE % 8 == 0)

    def __init__(self, d: int = 128, nlist: int = 256, m: int = 64,
                 nbits: int = 8, nprobe: int = 40, refine: bool = False,
                 decode_int8: bool = False):
        assert d % m == 0
        self.d, self.nlist, self.m, self.nprobe = d, nlist, m, nprobe
        self.ksub = 2 ** nbits
        self.dsub = d // m
        self.refine = refine
        # Opt-in: decode by selecting int8-quantized codewords with an
        # s8×s8→s32 dot (half the one-hot operand bytes of the bf16 path),
        # rescaled per (m, dim). MEASURED @ 2 M rows, nq 2048, v5e: 2,513
        # QPS vs 2,673 for the bf16 one-hot — the halved operand does NOT
        # win (XLA's s8 dot lowering eats the saving), recall identical
        # (0.9961). Kept opt-in for re-testing at other scales.
        self.decode_int8 = decode_int8
        self._books_q_cache = None
        self.ntotal = 0
        self._trained = False

    # -- train -------------------------------------------------------------
    def train(self, data: np.ndarray, max_train: int = int(1e7),
              kmeans_iters: int = 10, seed: int = 0) -> None:
        if len(data) < self.nlist * 4:
            raise ValueError(
                f"IVF-PQ needs >= {self.nlist * 4} training vectors for "
                f"nlist={self.nlist} (got {len(data)}); use the exact 'l2'/"
                "'ip' index for small databases")
        # subsample BEFORE full conversion (data may be a disk memmap)
        if len(data) > max_train:
            sel = np.sort(np.random.default_rng(seed)
                          .permutation(len(data))[:max_train])
            data = np.asarray(data[sel], np.float32)
        else:
            data = np.asarray(data, np.float32)
        x = jnp.asarray(data)
        self.centroids = kmeans(x, self.nlist, iters=kmeans_iters,
                                key=jax.random.PRNGKey(seed))   # (nlist, d)
        # PQ codebooks on residuals.
        assign = self._assign_np(data)
        resid = data - np.asarray(self.centroids)[assign]
        resid = resid.reshape(-1, self.m, self.dsub)
        books = []
        for mi in range(self.m):
            books.append(kmeans(jnp.asarray(resid[:, mi]), self.ksub,
                                iters=kmeans_iters,
                                key=jax.random.PRNGKey(seed + 1 + mi)))
        self.codebooks = jnp.stack(books)                   # (m, ksub, dsub)
        self._books_q_cache = None     # retrain invalidates quantized books
        self._trained = True

    def _assign_np(self, data: np.ndarray) -> np.ndarray:
        return assign_to_centroids(data, self.centroids)

    # -- add ---------------------------------------------------------------
    # Past this many rows both add() passes encode on the HOST (torch BLAS)
    # instead of shipping f32 blocks to the device: through a slow
    # host<->device link the device path moves 2x the full f32 DB (27 GB
    # each way at 100x scale) while the host GEMMs are minutes of CPU.
    HOST_ENCODE_ROWS = 1 << 23

    def add(self, data, block: int = 1 << 20,
            persist_path: Optional[str] = None) -> None:
        """Encode and store (single-shot add; extend-in-place unsupported).

        Layout: rows sorted by coarse list, each list padded to a multiple
        of LIST_TILE rows (pad rows carry id −1), total padded to a
        multiple of BLK — so every LIST_TILE-row subtile belongs to exactly
        one list and the probe mask is a per-subtile bias.

        Streams ``data`` block-by-block (accepts a disk memmap): the only
        O(N) host buffers are the uint8 codes (64 B/row) and int32
        assignment/order arrays — never a second full-size f32 copy, so a
        100x-protocol-scale (27 GB) source encodes in ~4 GB of RAM.

        ``persist_path``: save the built store (npz, host arrays) before
        the device upload so a killed run resumes via :meth:`load`.
        """
        assert self._trained, "train() before add()"
        lt = self.LIST_TILE
        n = len(data)
        host = n >= self.HOST_ENCODE_ROWS
        cents_np = np.asarray(self.centroids)
        # pass 1: coarse assignment, streamed off the source. All block
        # buffers are allocated ONCE and reused — fresh per-block arrays
        # fault at ~1 ms/page on this VM's on-demand memory (CLAUDE.md).
        assign = np.empty(n, np.int32)
        xbuf = np.empty((min(block, n), self.d), np.float32)
        simbuf = (np.empty((min(block, n), self.nlist), np.float32)
                  if host else None)
        for s in range(0, n, block):
            e = min(s + block, n)
            blk_rows = xbuf[:e - s]
            blk_rows[:] = data[s:e]
            assign[s:e] = (
                _host_assign_block(blk_rows, cents_np,
                                   sim_out=simbuf[:e - s])
                if host else assign_to_centroids(blk_rows, self.centroids))
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]

        # pass 2: gather sorted rows in blocks, PQ-encode residuals
        # (on host past HOST_ENCODE_ROWS; order is grouped by list, so the
        # gathers hit the page cache). Warm buffers again.
        books_np = np.asarray(self.codebooks)
        codes = np.empty((n, self.m), np.uint8)
        enc = jax.jit(self._encode_block)
        eb = 16384 if host else 65536
        rowbuf = np.empty((min(eb, n), self.d), np.float32)
        centbuf = np.empty((min(eb, n), self.d), np.float32)
        esim = (np.empty((min(eb, n), self.ksub), np.float32)
                if host else None)
        for s in range(0, n, eb):
            e = min(s + eb, n)
            idxs = order[s:e]
            rows = rowbuf[:e - s]
            np.take(data, idxs, axis=0, out=rows)
            cb = centbuf[:e - s]
            np.take(cents_np, sorted_assign[s:e], axis=0, out=cb)
            rows -= cb                                  # residuals in place
            codes[s:e] = (
                _host_pq_encode_block(rows, books_np, sim_out=esim) if host
                else np.asarray(enc(jnp.asarray(rows))))

        counts = np.bincount(sorted_assign, minlength=self.nlist)
        padded = np.maximum((counts + lt - 1) // lt, 1) * lt
        n_pad = int(padded.sum())
        n_pad += (-n_pad) % self.BLK            # filler subtiles at the end
        starts_p = np.concatenate([[0], np.cumsum(padded)[:-1]])
        starts_u = np.concatenate([[0], np.cumsum(counts)[:-1]])

        codes_pad = np.zeros((n_pad, self.m), np.uint8)
        ids_pad = np.full(n_pad, -1, np.int32)
        sub_list = np.full(n_pad // lt, -1, np.int32)
        for li in range(self.nlist):
            c, sp = counts[li], starts_p[li]
            codes_pad[sp:sp + c] = codes[starts_u[li]:starts_u[li] + c]
            ids_pad[sp:sp + c] = order[starts_u[li]:starts_u[li] + c]
            sub_list[sp // lt:(sp + padded[li]) // lt] = li

        if persist_path:
            np.savez(persist_path, nlist=self.nlist, m=self.m,
                     ksub=self.ksub, ntotal=n,
                     centroids=np.asarray(self.centroids),
                     codebooks=books_np, codes=codes_pad, ids=ids_pad,
                     sub_list=sub_list)
        self.codes = _chunked_device_put(codes_pad)  # (N_pad, m) uint8
        self.ids = _chunked_device_put(ids_pad)      # row -> original id
        self.sub_list = jnp.asarray(sub_list)        # subtile -> list id
        self.raw = _chunked_device_put(np.asarray(data, np.float32)) \
            if self.refine else None
        self.n_pad = n_pad
        self.ntotal = len(data)

    @classmethod
    def load(cls, path: str, nprobe: int = 40) -> "IVFPQIndex":
        """Load a store persisted by ``add(persist_path=...)``; chunked
        uploads (a 100x-scale code array is ~3.4 GB). ``refine`` stores
        are not persisted (the raw vectors dominate the size)."""
        z = np.load(path)
        m = int(z["m"])
        d = int(z["centroids"].shape[1])
        idx = cls(d=d, nlist=int(z["nlist"]), m=m, nprobe=nprobe)
        idx.centroids = jnp.asarray(z["centroids"])
        idx.codebooks = jnp.asarray(z["codebooks"])
        idx.codes = _chunked_device_put(z["codes"])
        idx.ids = _chunked_device_put(z["ids"])
        idx.sub_list = jnp.asarray(z["sub_list"])
        idx.raw = None
        idx.n_pad = int(idx.codes.shape[0])
        idx.ntotal = int(z["ntotal"])
        idx._trained = True
        return idx

    def _encode_block(self, resid: jax.Array) -> jax.Array:
        r = resid.reshape(-1, self.m, self.dsub)        # (n, m, dsub)
        sim = (2.0 * jnp.einsum("nmd,mkd->nmk", r, self.codebooks,
                                preferred_element_type=jnp.float32)
               - jnp.sum(self.codebooks ** 2, -1)[None])
        return jnp.argmax(sim, axis=-1).astype(jnp.uint8)

    # -- search ------------------------------------------------------------
    def _quantized_books(self):
        """int8 codebooks + per-(m, dim) f32 scale, for the low-traffic
        decode path (computed once from the f32 books; not persisted)."""
        if self._books_q_cache is None:
            b = np.asarray(self.codebooks, np.float32)       # (m, ksub, dsub)
            scale = np.maximum(np.abs(b).max(axis=1, keepdims=True),
                               1e-12) / 127.0                # (m, 1, dsub)
            q = np.clip(np.round(b / scale), -127, 127).astype(np.int8)
            self._books_q_cache = (jnp.asarray(q),
                                   jnp.asarray(scale[:, 0, :]
                                               .astype(np.float32)))
        return self._books_q_cache

    def _decode_chunk(self, codes: jax.Array, sub_list: jax.Array):
        """Decode a code chunk to bf16 vectors: one-hot × codebook einsum
        (MXU) + coarse centroid per subtile. Shared across the query block.
        The int8 path runs on every backend (CPU XLA lowers the s8 einsum
        too) so an off-TPU smoke run measures the path it claims to."""
        if self.decode_int8:
            bq, bs = self._quantized_books()
            return _pq_decode_chunk_i8(codes, sub_list, bq, bs,
                                       self.centroids, lt=self.LIST_TILE)
        return _pq_decode_chunk(codes, sub_list, self.codebooks,
                                self.centroids, lt=self.LIST_TILE)

    # default DB-chunk rows per decode pass: the transient decoded bf16
    # chunk stays ~512 MB (tests shrink it to exercise multi-chunk merging)
    CHUNK_ROWS = 1 << 21

    # Probe-pruned decode (small-query latency regime). The chunk-major
    # loop decodes 100% of the DB per search call; faiss scans only probed
    # lists. Traffic math: the union of probed lists over nq queries
    # covers an expected 1-(1-nprobe/nlist)^nq of the DB — at the
    # reference's nlist 256 / nprobe 40 that is 15.6% for nq=1 but
    # already 99.7% at nq=32, so batch searches (the eval protocol,
    # nq 2048) gain nothing and stay on the straight linear scan. When
    # measured coverage is below PRUNE_COVERAGE the search instead
    # gathers just the probed subtiles into a compacted copy (a device
    # take at LIST_TILE granularity — traffic ~ 2x the gathered bytes,
    # far below the decode it avoids) and runs the identical
    # decode+score+merge loop over it; pad slots carry list id -1 so the
    # existing filler-subtile masking drops them. Gather sizes are
    # rounded up to a power of two of BLK-sized units to bound the
    # number of compiled shapes.
    PRUNE_COVERAGE = 0.5
    prune = True

    def _gather_pruned(self, needed: np.ndarray, lt: int):
        """Compact the probed subtiles; returns (codes, ids, sub_list,
        n_rows) views equivalent to the full arrays for scan purposes."""
        sub_idx = np.where(needed)[0].astype(np.int32)
        unit = self.BLK // lt
        n_units = max(1, -(-len(sub_idx) // unit))
        n_units = 1 << (n_units - 1).bit_length()       # next pow2
        n_pad = min(n_units * unit, max(self.n_pad // lt, unit))
        if n_pad * lt >= self.n_pad:                    # nothing to save
            return self.codes, self.ids, self.sub_list, self.n_pad
        sub_idx = np.pad(sub_idx, (0, n_pad - len(sub_idx)),
                         constant_values=-1)
        c, i, s = _pq_gather_subtiles(self.codes, self.ids, self.sub_list,
                                      jnp.asarray(sub_idx), lt=lt)
        return c, i, s, n_pad * lt

    def search(self, q: np.ndarray, k: int, block: int = 512,
               chunk_rows: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(q, np.float32)
        lt = self.LIST_TILE
        # the masked kernel holds three (block, BLK) f32 buffers in VMEM
        # (sim, bias expansion, merge candidates): clamp to its budget
        if jax.default_backend() == "tpu":
            block = min(block, (2 << 20) // (self.BLK * 4))
        chunk = min(self.n_pad, chunk_rows or self.CHUNK_ROWS)
        chunk -= chunk % self.BLK
        chunk = max(chunk, self.BLK)
        use_pallas = jax.default_backend() == "tpu"
        keep = min(4 * k if self.refine else k, self.n_pad)
        # Stage every query block up front (device queries, per-LIST probe
        # bitmap, running top-k), then decode each DB chunk ONCE and score
        # it against ALL blocks. Decoding is the HBM-bound stage (the
        # one-hot einsum materializes (C, m, ksub) per chunk); the old
        # block-major loop re-decoded the whole DB per 512-query block —
        # at 53.6 M rows that was ~4 s of decode per block, i.e. the
        # entire 125-QPS measurement. Chunk-major amortizes decode over
        # the full query set. The probe bias is likewise kept as a tiny
        # (nq, nlist) bitmap and expanded to subtile granularity per
        # chunk, instead of materializing the (nq, n_sub) whole-DB bias
        # (858 MB at 53.6 M) on device per block.
        blocks = []
        for s in range(0, len(q), block):
            blk = q[s:s + block]
            pad = block - len(blk) if len(blk) < block and len(q) > block else 0
            if use_pallas:
                # the kernel's transposed bias wants Bq % 128 == 0
                pad = max(pad, (-len(blk)) % 128)
            if pad:
                blk = np.pad(blk, ((0, pad), (0, 0)))
            qd = jnp.asarray(blk)
            blocks.append({
                "qd": qd, "pad": pad,
                "bias": _pq_bias_list(qd, self.centroids,
                                      nprobe=self.nprobe),   # (nq, nlist)
                "v": jnp.full((len(blk), keep), -jnp.inf),
                "i": jnp.full((len(blk), keep), -1, jnp.int32),
            })
        codes_v, ids_v, sub_v, n_scan = (self.codes, self.ids,
                                         self.sub_list, self.n_pad)
        if self.prune:
            probed = None
            for b in blocks:
                pa = np.asarray(_pq_probed_lists(b["bias"]))
                probed = pa if probed is None else (probed | pa)
            needed = np.asarray(_pq_sub_needed(jnp.asarray(probed),
                                               self.sub_list))
            if needed.mean() <= self.PRUNE_COVERAGE:
                codes_v, ids_v, sub_v, n_scan = self._gather_pruned(
                    needed, lt)
        for cs in range(0, n_scan, chunk):
            ce = min(cs + chunk, n_scan)
            sub_c = jax.lax.dynamic_slice_in_dim(sub_v, cs // lt,
                                                 (ce - cs) // lt)
            dec = self._decode_chunk(
                jax.lax.dynamic_slice_in_dim(codes_v, cs, ce - cs),
                sub_c)
            ids_c = jax.lax.dynamic_slice_in_dim(ids_v, cs, ce - cs)
            for b in blocks:
                bias_c = _pq_expand_bias(b["bias"], sub_c)
                if use_pallas:
                    from nafp_tpu.search.pallas_topk import \
                        topk_ip_pallas_masked
                    v, i = topk_ip_pallas_masked(
                        b["qd"].astype(jnp.bfloat16), dec, ids_c, bias_c,
                        k=keep, blk=self.BLK, list_tile=lt)
                else:
                    v, i = _pq_score_chunk_xla(b["qd"], dec, ids_c, bias_c,
                                               k=keep, lt=lt)
                b["v"], b["i"] = _merge_topk(b["v"], b["i"], v, i)
        outs_d, outs_i = [], []
        for b in blocks:
            best_v, best_i = b["v"], b["i"]
            if self.refine:
                best_v, best_i = _pq_refine(b["qd"], self.raw, best_v,
                                            best_i, k=k)
            else:
                best_v, best_i = best_v[:, :k], best_i[:, :k]
            n = best_v.shape[0] - b["pad"]
            outs_d.append(np.asarray(best_v[:n]))
            outs_i.append(np.asarray(best_i[:n]))
        return np.concatenate(outs_d), np.concatenate(outs_i)


@functools.partial(jax.jit, static_argnames=("lt",))
def _pq_decode_chunk(codes, sub_list, codebooks, centroids, *, lt):
    """decode(x) = centroid[list] + Σ_m codebook_m[code_m], as one-hot
    matmuls (no gathers): codes (C, m) uint8 -> (C, d) bf16."""
    c, m = codes.shape
    ksub, dsub = codebooks.shape[1], codebooks.shape[2]
    # bf16 one-hot on TPU (native MXU mode); CPU XLA's DotThunk lacks
    # bf16 x bf16 -> f32, so tests run the einsum in f32
    cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    oh = jax.nn.one_hot(codes.astype(jnp.int32), ksub,
                        dtype=cdt)                           # (C, m, ksub)
    resid = jnp.einsum("nmk,mkd->nmd", oh, codebooks.astype(cdt),
                       preferred_element_type=jnp.float32)   # (C, m, dsub)
    dec = resid.reshape(c, m * dsub)
    coarse = centroids[jnp.maximum(sub_list, 0)]             # (C//lt, d)
    dec = dec + jnp.repeat(coarse, lt, axis=0)
    return dec.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("lt",))
def _pq_decode_chunk_i8(codes, sub_list, books_q, book_scale, centroids,
                        *, lt):
    """Half-traffic decode: the one-hot operand is int8 and the dot runs
    s8×s8→s32 on the MXU (v5e native). A one-hot row sums exactly one
    codeword, so the integer dot SELECTS the int8-quantized codeword
    bit-exactly; the per-(m, dim) f32 rescale + coarse-centroid add fuse
    into the dot's output. Decode error is pure codebook quantization
    (≤ max|book_m|/254 per dim), far below the PQ reconstruction error
    itself — recall parity is asserted in tests and measured in the
    protocol runs."""
    c, m = codes.shape
    ksub = books_q.shape[1]
    oh = jax.nn.one_hot(codes.astype(jnp.int32), ksub, dtype=jnp.int8)
    resid = jnp.einsum("nmk,mkd->nmd", oh, books_q,
                       preferred_element_type=jnp.int32)     # (c, m, dsub)
    resid = resid.astype(jnp.float32) * book_scale[None]     # scale (m, dsub)
    dec = resid.reshape(c, -1)
    coarse = centroids[jnp.maximum(sub_list, 0)]             # (c//lt, d)
    dec = dec + jnp.repeat(coarse, lt, axis=0)
    return dec.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("nprobe",))
def _pq_bias_list(q, centroids, *, nprobe):
    """0 / −inf additive bias per (query, LIST) from the coarse probe —
    a (nq, nlist) bitmap, expanded to subtile granularity chunk-by-chunk
    by `_pq_expand_bias` (never materializing the whole-DB bias)."""
    from nafp_tpu.search.pallas_topk import NEG
    q_cent = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probes = jax.lax.top_k(q_cent, nprobe)                # (nq, nprobe)
    probed = jnp.sum(jax.nn.one_hot(probes, centroids.shape[0],
                                    dtype=jnp.float32), axis=1)  # (nq,nlist)
    return jnp.where(probed > 0, 0.0, NEG)                   # (nq, nlist)


@jax.jit
def _pq_expand_bias(bias_list, sub_chunk):
    """subtile -> its list's bias; filler subtiles (list -1) get NEG."""
    from nafp_tpu.search.pallas_topk import NEG
    b = jnp.take(bias_list, jnp.maximum(sub_chunk, 0), axis=1)
    return jnp.where(sub_chunk[None, :] < 0, NEG, b)


@jax.jit
def _pq_probed_lists(bias_list):
    """(nq, nlist) additive bias -> (nlist,) bool: any query probes it."""
    from nafp_tpu.search.pallas_topk import NEG
    return jnp.any(bias_list > NEG / 2, axis=0)


@jax.jit
def _pq_sub_needed(probed, sub_list):
    """(nlist,) probed bitmap -> (n_sub,) bool per subtile (filler
    subtiles, list -1, are never needed)."""
    return jnp.take(probed, jnp.maximum(sub_list, 0)) & (sub_list >= 0)


@functools.partial(jax.jit, static_argnames=("lt",))
def _pq_gather_subtiles(codes, ids, sub_list, sub_idx, *, lt):
    """Compact probed subtiles into contiguous arrays (device take at
    LIST_TILE granularity). Pad slots (sub_idx -1) clamp their gather to
    subtile 0 — the garbage codes/ids there are dead because their list
    id is forced to -1, which the bias expansion masks to NEG exactly
    like the store's own filler subtiles."""
    n_sub, m = sub_list.shape[0], codes.shape[1]
    safe = jnp.maximum(sub_idx, 0)
    c = jnp.take(codes.reshape(n_sub, lt * m), safe, axis=0,
                 mode="clip").reshape(-1, m)
    i = jnp.take(ids.reshape(n_sub, lt), safe, axis=0,
                 mode="clip").reshape(-1)
    s = jnp.where(sub_idx < 0, -1, jnp.take(sub_list, safe, mode="clip"))
    return c, i, s


@functools.partial(jax.jit, static_argnames=("k", "lt"))
def _pq_score_chunk_xla(q, dec, ids, bias, *, k, lt):
    """XLA fallback for the masked scored top-k (CPU tests / non-TPU)."""
    from nafp_tpu.search.pallas_topk import NEG
    sim = jnp.dot(q, dec.T.astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    sim = sim + jnp.repeat(bias, lt, axis=1)
    sim = jnp.where(ids[None, :] < 0, NEG, sim)
    v, pos = jax.lax.top_k(sim, min(k, sim.shape[1]))
    i = jnp.take(ids, pos)
    if v.shape[1] < k:
        v = jnp.pad(v, ((0, 0), (0, k - v.shape[1])), constant_values=NEG)
        i = jnp.pad(i, ((0, 0), (0, k - i.shape[1])), constant_values=-1)
    return v, jnp.where(v <= NEG / 2, -1, i)


@jax.jit
def _merge_topk(best_v, best_i, v, i):
    all_v = jnp.concatenate([best_v, v], axis=1)
    all_i = jnp.concatenate([best_i, i], axis=1)
    nv, sel = jax.lax.top_k(all_v, best_v.shape[1])
    return nv, jnp.take_along_axis(all_i, sel, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def _pq_refine(q, raw, best_v, best_i, *, k):
    """Exact rescore of the PQ shortlist with the raw vectors (ivfpq-rr)."""
    vecs = raw[jnp.maximum(best_i, 0)]                       # (nq, keep, d)
    exact = jnp.einsum("nd,nkd->nk", q, vecs,
                       preferred_element_type=jnp.float32)
    exact = jnp.where(best_i >= 0, exact, -jnp.inf)
    d2, sel = jax.lax.top_k(exact, k)
    ids = jnp.take_along_axis(best_i, sel, axis=1)
    return d2, jnp.where(jnp.isfinite(d2), ids, -1)



# ---------------------------------------------------------------------------
# IVF-SQ8: the TPU-native scalable index
# ---------------------------------------------------------------------------
class IVFSQ8Index:
    """IVF with int8 scalar-quantized vectors and contiguous slice scans.

    The TPU-native answer to large-scale ANN: PQ's ADC scan is per-element
    LUT gathers, which measure ~28x slower than streaming on this hardware.
    Here vectors are stored int8 (per-vector scale; 129 B/vec = 2x PQ64's
    64 B, still 4x smaller than f32), *sorted by coarse list* so a probed
    list is one contiguous ``dynamic_slice`` feeding an int8 MXU matmul —
    measured 428 QPS/chip at 2M rows vs 3.3 QPS for gather-based ADC.

    A slice reads ``cap`` rows from the list start; rows past the list's
    end belong to the *next* lists and are scored too — they are genuine
    vectors with genuine ids, so they can only add recall. Tail rows past
    the DB are masked by id.
    """

    def __init__(self, d: int = 128, nlist: Optional[int] = None,
                 nprobe: int = 40):
        self.d, self.nlist, self.nprobe = d, nlist, nprobe
        self.ntotal = 0
        self._trained = False

    def train(self, data: np.ndarray, max_train: Optional[int] = None,
              kmeans_iters: int = 10, seed: int = 0) -> None:
        if self.nlist is None:
            # scale the coarse book with the DB (FAISS practice:
            # nlist ~ sqrt(N)); per-probe scan work is N/nlist rows, so a
            # fixed 256 would make each probe a 210k-row scan at the
            # 100x-protocol scale (53.6 M rows)
            self.nlist = int(np.clip(
                1 << int(np.log2(max(len(data), 2) ** 0.5) + 0.5),
                256, 16384))
        if max_train is None:
            # FAISS-style training budget: ~256 points per centroid
            max_train = max(int(1e6), 256 * self.nlist)
        # subsample BEFORE any full-array conversion: `data` may be a
        # disk memmap at the 100x-protocol scale (27 GB f32)
        if len(data) > max_train:
            sel = np.sort(np.random.default_rng(seed)
                          .permutation(len(data))[:max_train])
            data = np.asarray(data[sel], np.float32)
        else:
            data = np.asarray(data, np.float32)
        self.centroids = kmeans(jnp.asarray(data), self.nlist,
                                iters=kmeans_iters,
                                key=jax.random.PRNGKey(seed))
        self._trained = True

    def add(self, data, block: int = 1 << 20,
            persist_path: Optional[str] = None) -> None:
        """Quantize + list-sort the DB into the device store.

        Streams ``data`` block-by-block (accepts a disk memmap: no second
        full-size f32 host copy is ever made). Each block is quantized
        int8 FIRST and the coarse assignment runs on the quantized
        representation — the one the scan will score at search time, and
        4x less host->device traffic than shipping f32 (the dominant
        build cost when the device sits behind a slow transport).

        ``persist_path``: save the built store (npz) from the HOST arrays
        before the device upload — reading them back off the device later
        costs a full device->host transfer of the store.
        """
        assert self._trained, "train() before add()"
        n = len(data)
        # single source pass: quantize, park the int8 block on the device
        # (it is needed there anyway), and assign from the int8 form. The
        # multi-GB store therefore crosses the host->device link ONCE.
        q8_flat = np.empty((n, self.d), np.int8)
        scales_flat = np.empty(n, np.float32)
        assign = np.empty(n, np.int32)
        buf = jnp.zeros((n, self.d), jnp.int8)       # unsorted device copy
        # warm per-block buffers: fresh allocations fault at ~1 ms/page
        # on this VM's on-demand memory (CLAUDE.md r3 notes)
        xbuf = np.empty((min(block, n), self.d), np.float32)
        for s in range(0, n, block):
            e = min(s + block, n)
            x = xbuf[:e - s]
            x[:] = data[s:e]
            sc = np.maximum(np.abs(x).max(axis=1), 1e-12) / 127.0
            x /= sc[:, None]
            np.rint(x, out=x)
            np.clip(x, -127, 127, out=x)
            q = q8_flat[s:e]
            q[:] = x                                  # cast into the store
            scales_flat[s:e] = sc
            blk = jnp.asarray(q)
            buf = _update_rows(buf, blk, jnp.asarray(s, jnp.int32))
            assign[s:e] = np.asarray(_assign_int8_block(
                blk, jnp.asarray(sc.astype(np.float32)), self.centroids))
        counts = np.bincount(assign, minlength=self.nlist)
        self.list_cap = int(max(1, counts.max()))
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

        # list-sorted padded layout: lists are contiguous with no
        # inter-list padding (starts = plain cumsum), so stable sort order
        # IS the final layout; `pad` tail rows only let the last list's
        # slice read `cap` rows (masked by id −1).
        pad = self.list_cap
        order = np.argsort(assign, kind="stable")
        scales = np.zeros(n + pad, np.float32)
        ids = np.full(n + pad, -1, np.int32)
        scales[:n] = scales_flat[order]
        ids[:n] = order.astype(np.int32)
        self.ntotal = n
        if persist_path:
            # host-permuted copy only for the npz (no device read-back)
            q8s = np.zeros((n + pad, self.d), np.int8)
            q8s[:n] = q8_flat[order]
            np.savez(persist_path, nlist=self.nlist, list_cap=self.list_cap,
                     ntotal=n, centroids=np.asarray(self.centroids),
                     vecs8=q8s, scales=scales,
                     starts=starts.astype(np.int32), ids=ids)
            del q8s
        del scales_flat

        # permute into the sorted layout ON DEVICE (chunked row gathers
        # into a donated target — no second multi-GB host->device ship).
        # The device transiently holds ~2x the store; if it cannot, fall
        # back to sorting on the host and re-shipping chunked.
        try:
            self.vecs8 = _device_permute_rows(buf, order, n + pad)
            del buf
        except Exception as e:
            del buf
            print(f"[ivf-sq8] device permute failed ({type(e).__name__}); "
                  "falling back to host sort + chunked upload")
            q8s = np.zeros((n + pad, self.d), np.int8)
            q8s[:n] = q8_flat[order]
            self.vecs8 = _chunked_device_put(q8s)
            del q8s
        del q8_flat
        self.scales = _chunked_device_put(scales)
        self.starts = jnp.asarray(starts.astype(np.int32))
        self.ids = _chunked_device_put(ids)

    def _publish(self, q8, scales, starts, ids) -> None:
        """Move an already-sorted host store to the device (chunked)."""
        self.vecs8 = _chunked_device_put(q8)
        self.scales = _chunked_device_put(scales)
        self.starts = jnp.asarray(starts.astype(np.int32))
        self.ids = _chunked_device_put(ids)

    @classmethod
    def load(cls, path: str, nprobe: int = 40) -> "IVFSQ8Index":
        """Load a store persisted by ``add(persist_path=...)``; uploads in
        bounded chunks (a 100x-scale store is ~7 GB — one monolithic
        device_put would hit the transfer-buffer limits chunking avoids)."""
        z = np.load(path)
        idx = cls(d=int(z["centroids"].shape[1]), nlist=int(z["nlist"]),
                  nprobe=nprobe)
        idx.list_cap = int(z["list_cap"])
        idx.ntotal = int(z["ntotal"])
        idx.centroids = jnp.asarray(z["centroids"])
        idx._publish(z["vecs8"], z["scales"], z["starts"], z["ids"])
        idx._trained = True
        return idx

    def _search_block(self, q: jax.Array, k: int):
        return _ivfsq8_search_block(
            q, self.centroids, self.vecs8, self.scales, self.starts,
            self.ids, k=k, nprobe=self.nprobe, cap=self.list_cap, d=self.d)

    def search(self, q: np.ndarray, k: int,
               block: int = 64) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(q, np.float32)
        outs_d, outs_i = [], []
        for s in range(0, len(q), block):
            blk = q[s:s + block]
            pad = block - len(blk) if len(blk) < block and len(q) > block else 0
            if pad:
                blk = np.pad(blk, ((0, pad), (0, 0)))
            d, ids = self._search_block(jnp.asarray(blk), k)
            n = len(blk) - pad
            outs_d.append(np.asarray(d[:n]))
            outs_i.append(np.asarray(ids[:n]))
        return np.concatenate(outs_d), np.concatenate(outs_i)


def _sq8_probe_scan(qb, probes, q_cent, vecs8, scales, starts_arr, ids_arr,
                    *, nprobe, cap, d, keep):
    """The IVF-SQ8 inner scan: stream the probed lists one at a time as
    contiguous int8 slices feeding bf16 MXU matvecs, with a running top-keep
    merge, then de-duplicate overlapping tail rescoring. Shared by the
    single-device and mesh-sharded indexes (the latter calls it per shard
    with its local arrays)."""
    nq = qb.shape[0]

    def scan_probe(i, carry):
        best_v, best_i = carry
        p = jax.lax.dynamic_slice(probes, (0, i), (nq, 1))[:, 0]
        starts = starts_arr[p]                           # (nq,)

        def one(qi, si):
            blk = jax.lax.dynamic_slice(
                vecs8, (si, 0), (cap, d)).astype(jnp.bfloat16)
            sc = jax.lax.dynamic_slice(scales, (si,), (cap,))
            rid = jax.lax.dynamic_slice(ids_arr, (si,), (cap,))
            s = jnp.dot(blk, qi, preferred_element_type=jnp.float32)
            return s * sc, rid

        score, rid = jax.vmap(one)(qb, starts)          # (nq, cap)
        score = jnp.where(rid >= 0, score, -jnp.inf)
        all_v = jnp.concatenate([best_v, score], axis=1)
        all_i = jnp.concatenate([best_i, rid], axis=1)
        best_v, sel = jax.lax.top_k(all_v, keep)
        best_i = jnp.take_along_axis(all_i, sel, axis=1)
        return best_v, best_i

    init = (jnp.full((nq, keep), -jnp.inf),
            jnp.full((nq, keep), -1, jnp.int32))
    best_v, best_i = jax.lax.fori_loop(0, nprobe, scan_probe, init)
    # dedup (overlapping tail slices can rescore the same row)
    order = jnp.argsort(best_i, axis=1)
    bi = jnp.take_along_axis(best_i, order, axis=1)
    bv = jnp.take_along_axis(best_v, order, axis=1)
    dup = jnp.concatenate([jnp.zeros_like(bi[:, :1], bool),
                           bi[:, 1:] == bi[:, :-1]], axis=1)
    bv = jnp.where(dup | (bi < 0), -jnp.inf, bv)
    return bv, bi


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "cap", "d"))
def _ivfsq8_search_block(q, centroids, vecs8, scales, starts_arr, ids_arr,
                         *, k, nprobe, cap, d):
    nq = q.shape[0]
    q_cent = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    _, probes = jax.lax.top_k(q_cent, nprobe)           # (nq, nprobe)
    keep = min(2 * k, nprobe * cap)
    bv, bi = _sq8_probe_scan(q.astype(jnp.bfloat16), probes, q_cent, vecs8,
                             scales, starts_arr, ids_arr,
                             nprobe=nprobe, cap=cap, d=d, keep=keep)
    d2, sel = jax.lax.top_k(bv, k)
    ids = jnp.take_along_axis(bi, sel, axis=1)
    return d2, jnp.where(jnp.isfinite(d2), ids, -1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _gather_rows_into(dst: jax.Array, src: jax.Array, idxs: jax.Array,
                      start: jax.Array):
    rows = jnp.take(src, idxs, axis=0)
    return jax.lax.dynamic_update_slice_in_dim(dst, rows, start, axis=0)


def _device_permute_rows(src: jax.Array, order: np.ndarray,
                         out_rows: int, chunk: int = 1 << 20) -> jax.Array:
    """dst[:len(order)] = src[order] computed on device: chunked gathers
    into a donated destination. Only `order` (4 B/row) crosses the wire;
    rows past len(order) stay zero."""
    dst = jnp.zeros((out_rows,) + src.shape[1:], src.dtype)
    n = len(order)
    nfull = (n // chunk) * chunk
    for s in range(0, nfull, chunk):
        dst = _gather_rows_into(dst, src, jnp.asarray(order[s:s + chunk]),
                                jnp.asarray(s, jnp.int32))
    if nfull < n:
        dst = _gather_rows_into(dst, src, jnp.asarray(order[nfull:]),
                                jnp.asarray(nfull, jnp.int32))
    return dst


# Bounded-chunk uploads live in utils/device.py (shared with the
# device-resident corpus loader, data/device_corpus.py); keep the private
# aliases so index code and tests read the same.
_chunked_device_put = chunked_device_put


# ---------------------------------------------------------------------------
def cacheable_cls(index_type: str, nprobe: int = 40):
    """(cls, load_kwargs) for index types whose built store persists to /
    loads from an npz (the int8 family; quantize+ship is the hours-long
    part at 100x scale). (None, None) for everything else. Lives next to
    get_index so the name->class mapping has exactly one owner module
    (tests assert the two stay consistent)."""
    t = index_type.lower()
    if t == "ivf-sq8":
        return IVFSQ8Index, {"nprobe": nprobe}
    if t in ("sq8", "sq8-flat"):
        return SQ8FlatIndex, {}
    if t == "sq8-sharded":
        from nafp_tpu.search.sharded import ShardedSQ8FlatIndex
        return ShardedSQ8FlatIndex, {}
    if t == "ivf-sq8-sharded":
        from nafp_tpu.search.sharded import ShardedIVFSQ8Index
        return ShardedIVFSQ8Index, {"nprobe": nprobe}
    return None, None


def get_index(index_type: str, train_data: np.ndarray,
              max_train: int = int(1e7), nprobe: int = 40,
              ef_search: int = 64):
    """Index factory (counterpart of get_index, get_index_faiss.py:10-121).

    'l2'/'ip' exact; 'ivf' = IVF-PQ with near-lossless settings is not
    meaningfully distinct on TPU (matmul scan is exact) so it maps to the
    exact index; 'ivfpq' / 'ivfpq-rr' use the reference's compression
    parameters; 'ivf-sq8' is the TPU-native scalable index (int8 contiguous
    slice scans); 'hnsw' builds the native C++ graph index (host-side like
    the reference's CPU-only faiss.IndexHNSWFlat, M=16). efConstruction
    defaults to 200 — the measured setting where recall clears the faiss
    parity bar (0.9868 @ ef_search 128 @ 500k; efC 80 tops out at 0.932) —
    and ``ef_search`` sets the query-time beam (faiss default 64 equiv).
    """
    t = index_type.lower()
    d = train_data.shape[1]
    if t in ("l2", "ip", "ivf"):
        return FlatIndex(train_data, metric="l2" if t == "l2" else "ip")
    if t in ("ivfpq", "ivfpq-rr"):
        # m=64 subquantizers is the reference's d=128 setting
        # (get_index_faiss.py:69-83); for smaller embeddings (EMB_SZ is
        # configurable here) fall back to 2 dims/subquantizer
        m = 64 if d % 64 == 0 else max(d // 2, 1)
        idx = IVFPQIndex(d=d, nlist=256, m=m, nbits=8, nprobe=nprobe,
                         refine=(t == "ivfpq-rr"))
        idx.train(train_data, max_train=max_train)
        return idx
    # ivf-sq8's kmeans budget scales with its auto nlist (256 rows/centroid,
    # FAISS practice); the generic 1e7 default would subsample+ship 5 GB f32
    # at 100x scale for no recall gain. An explicitly smaller cap is honored.
    sq8_cap = None if max_train >= int(1e7) else max_train
    if t == "ivf-sq8":
        idx = IVFSQ8Index(d=d, nprobe=nprobe)  # nlist auto ~ sqrt(N)
        idx.train(train_data, max_train=sq8_cap)
        return idx
    if t in ("sq8", "sq8-flat"):
        # exact full-scan over the int8 store (fused Pallas kernel); the
        # throughput option at 100x scale — no recall/nprobe tradeoff
        return SQ8FlatIndex(d=d)
    if t == "sq8-sharded":
        from nafp_tpu.search.sharded import ShardedSQ8FlatIndex
        return ShardedSQ8FlatIndex(d=d)
    if t == "ivf-sq8-sharded":
        # the scalable index with every inverted list row-sharded over the
        # device mesh (capacity + per-probe compute scale with mesh size)
        from nafp_tpu.search.sharded import ShardedIVFSQ8Index
        idx = ShardedIVFSQ8Index(d=d, nprobe=nprobe)
        idx.train(train_data, max_train=sq8_cap)
        return idx
    if t == "l2-sharded":
        # exact search with the DB row-sharded over the device mesh
        from nafp_tpu.search.sharded import ShardedFlatIndex
        return ShardedFlatIndex(train_data)
    if t == "hnsw":
        from nafp_tpu.native.hnsw import HNSWIndex
        return HNSWIndex(d=d, m=16, ef_construction=200,
                         ef_search=ef_search)
    raise ValueError(index_type)
