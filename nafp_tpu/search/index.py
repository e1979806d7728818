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
        self.db = jnp.asarray(np.asarray(db), dtype)
        self.db_sq = jnp.sum(self.db.astype(jnp.float32) ** 2, axis=1)
        self.ntotal = self.db.shape[0]

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

    # Above ~1M rows, switch every search on this DB to the fused Pallas
    # kernel that streams DB tiles and never materializes the (Bq, N)
    # logits (search/pallas_topk.py). Below that, XLA's matmul + TopK is
    # faster (measured: 40 ms vs 54 ms for 512x620k on v5e). The decision
    # is per-DB, not per-call: mixing paths compiles an XLA TopK program
    # over the full N for small warm-up batches, which the remote compiler
    # chokes on at large N.
    PALLAS_MIN_ROWS = 1_000_000

    def search(self, q: np.ndarray, k: int,
               block: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(q, np.float32)
        use_pallas = (jax.default_backend() == "tpu" and self.metric == "ip"
                      and self.ntotal >= self.PALLAS_MIN_ROWS)
        if use_pallas:
            from nafp_tpu.search.pallas_topk import topk_ip_pallas
            block = min(block, 512)  # VMEM sim-tile budget
        outs_d, outs_i = [], []
        for s in range(0, len(q), block):
            blk = q[s:s + block]
            pad = 0
            if len(blk) < min(block, len(q)) and len(q) > block:
                pad = block - len(blk)
                blk = np.pad(blk, ((0, pad), (0, 0)))
            if use_pallas:
                d, ids = topk_ip_pallas(jnp.asarray(blk),
                                        self.db.astype(jnp.float32), k=k)
            else:
                d, ids = self._search_block(jnp.asarray(blk), k)
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
def _lloyd_step(data: jax.Array, cents: jax.Array) -> jax.Array:
    """One Lloyd iteration: argmax-assignment matmul + one-hot segment sums
    (MXU, no scatters). Module-level jit so repeated kmeans() calls (the 64
    PQ codebooks) reuse one executable."""
    k = cents.shape[0]
    d_sq = jnp.sum(data ** 2, 1, keepdims=True)
    c_sq = jnp.sum(cents ** 2, 1)
    sim = (2.0 * jnp.dot(data, cents.T, preferred_element_type=jnp.float32)
           - c_sq[None, :] - d_sq)
    assign = jnp.argmax(sim, axis=1)                        # (n,)
    onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)   # (n, k)
    sums = jnp.dot(onehot.T, data, preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot, axis=0)[:, None]
    new = sums / jnp.maximum(counts, 1.0)
    # keep empty clusters where they were
    return jnp.where(counts > 0, new, cents)


@jax.jit
def _assign_block(data: jax.Array, cents: jax.Array):
    c_sq = jnp.sum(cents ** 2, 1)
    sim = (2.0 * jnp.dot(data, cents.T, preferred_element_type=jnp.float32)
           - c_sq[None, :])
    return jnp.argmax(sim, axis=1).astype(jnp.int32)


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
    """IVF-PQ with asymmetric-distance scan, built for inner-product ranking
    of L2-normalized fingerprints.

    Layout: DB vectors sorted by coarse-list id; PQ codes of the *residual*
    (x - centroid) like FAISS IVFPQ. Scan of a probed list scores
    sim(q, x) ≈ q·c + Σ_m LUT_m[code_m] with LUT_m = q_m · codebook_m.
    Lists are stored padded to a static cap so probing is jittable.

    refine_with (ivfpq-rr): keep the raw vectors and rescore the top
    candidates exactly, like FAISS IndexIVFPQR's refinement stage
    (get_index_faiss.py:77-83) — here exact f32 instead of a 4-bit PQ.
    """

    def __init__(self, d: int = 128, nlist: int = 256, m: int = 64,
                 nbits: int = 8, nprobe: int = 40, refine: bool = False):
        assert d % m == 0
        self.d, self.nlist, self.m, self.nprobe = d, nlist, m, nprobe
        self.ksub = 2 ** nbits
        self.dsub = d // m
        self.refine = refine
        self.ntotal = 0
        self._trained = False

    # -- train -------------------------------------------------------------
    def train(self, data: np.ndarray, max_train: int = int(1e7),
              kmeans_iters: int = 10, seed: int = 0) -> None:
        data = np.asarray(data, np.float32)
        if len(data) < self.nlist * 4:
            raise ValueError(
                f"IVF-PQ needs >= {self.nlist * 4} training vectors for "
                f"nlist={self.nlist} (got {len(data)}); use the exact 'l2'/"
                "'ip' index for small databases")
        if len(data) > max_train:
            sel = np.random.default_rng(seed).permutation(len(data))[:max_train]
            data = data[sel]
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
        self._trained = True

    def _assign_np(self, data: np.ndarray) -> np.ndarray:
        return assign_to_centroids(data, self.centroids)

    # -- add ---------------------------------------------------------------
    def add(self, data: np.ndarray) -> None:
        """Encode and store (single-shot add; extend-in-place unsupported)."""
        assert self._trained, "train() before add()"
        data = np.asarray(data, np.float32)
        assign = self._assign_np(data)
        order = np.argsort(assign, kind="stable")
        sorted_ids = order.astype(np.int32)
        sorted_assign = assign[order]
        resid = data[order] - np.asarray(self.centroids)[sorted_assign]

        # PQ-encode residuals blockwise on device.
        codes = np.empty((len(data), self.m), np.uint8)
        enc = jax.jit(self._encode_block)
        for s in range(0, len(data), 65536):
            codes[s:s + 65536] = np.asarray(
                enc(jnp.asarray(resid[s:s + 65536])))

        counts = np.bincount(sorted_assign, minlength=self.nlist)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        cap = int(max(1, counts.max()))
        # padded list layout: (nlist, cap) of row positions, -1 = pad
        lists = np.full((self.nlist, cap), -1, np.int32)
        for li in range(self.nlist):
            lists[li, :counts[li]] = np.arange(starts[li],
                                               starts[li] + counts[li])
        self.list_cap = cap
        self.lists = jnp.asarray(lists)
        self.codes = jnp.asarray(codes)                 # (N, m) uint8
        self.ids = jnp.asarray(sorted_ids)              # row -> original id
        self.list_of_row = jnp.asarray(sorted_assign)   # row -> list id
        self.raw = jnp.asarray(data[order]) if self.refine else None
        self.ntotal = len(data)

    def _encode_block(self, resid: jax.Array) -> jax.Array:
        r = resid.reshape(-1, self.m, self.dsub)        # (n, m, dsub)
        sim = (2.0 * jnp.einsum("nmd,mkd->nmk", r, self.codebooks,
                                preferred_element_type=jnp.float32)
               - jnp.sum(self.codebooks ** 2, -1)[None])
        return jnp.argmax(sim, axis=-1).astype(jnp.uint8)

    # -- search ------------------------------------------------------------
    def _search_block(self, q: jax.Array, k: int):
        return _ivfpq_search_block(
            q, self.centroids, self.codebooks, self.lists, self.codes,
            self.ids, self.raw if self.refine else None,
            k=k, nprobe=self.nprobe, m=self.m, dsub=self.dsub,
            cap=self.list_cap, refine=self.refine)

    def search(self, q: np.ndarray, k: int,
               block: int = 256) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(q, np.float32)
        # Cap the query block so the per-probe gather intermediates
        # (block x list_cap x m int32) stay within a ~32M-element budget;
        # oversized blocks fault the TPU worker at multi-million-row scale
        # (measured: block 256 crashes at 2M rows / cap 8180, 64 works).
        if getattr(self, "list_cap", 0):
            budget = (1 << 25) // max(1, self.list_cap * self.m)
            block = int(np.clip(budget, 16, block))
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


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "m", "dsub",
                                             "cap", "refine"))
def _ivfpq_search_block(q, centroids, codebooks, lists, codes_arr, ids_arr,
                        raw, *, k, nprobe, m, dsub, cap, refine):
    """ADC scan streamed one probed list at a time with a running top-k
    merge: peak memory is O(nq * cap), independent of nprobe. (A one-shot
    gather of all probed codes was a >30 GB allocation at 2M rows.)"""
    nq = q.shape[0]
    # 1. coarse probe: top-nprobe centroids by inner product
    q_cent = jnp.dot(q, centroids.T,
                     preferred_element_type=jnp.float32)  # (nq, nlist)
    _, probes = jax.lax.top_k(q_cent, nprobe)             # (nq, nprobe)
    lut = jnp.einsum("nmd,mkd->nmk", q.reshape(nq, m, dsub),
                     codebooks,
                     preferred_element_type=jnp.float32)  # (nq, m, ksub)
    keep = max(k, 4 * k if refine else k)
    keep = min(keep, nprobe * cap)

    def scan_probe(i, carry):
        best_v, best_r = carry
        p = jax.lax.dynamic_slice(probes, (0, i), (nq, 1))  # (nq, 1)
        rows = lists[p[:, 0]]                               # (nq, cap)
        valid = rows >= 0
        rows_safe = jnp.maximum(rows, 0)
        codes = codes_arr[rows_safe].astype(jnp.int32)      # (nq,cap,m)
        resid = jnp.take_along_axis(
            lut[:, None], codes[..., None], axis=-1)[..., 0].sum(-1)
        coarse = jnp.take_along_axis(q_cent, p, axis=1)     # (nq, 1)
        score = jnp.where(valid, coarse + resid, -jnp.inf)  # (nq, cap)
        all_v = jnp.concatenate([best_v, score], axis=1)
        all_r = jnp.concatenate([best_r, rows_safe], axis=1)
        best_v, sel = jax.lax.top_k(all_v, keep)
        best_r = jnp.take_along_axis(all_r, sel, axis=1)
        return best_v, best_r

    init = (jnp.full((nq, keep), -jnp.inf),
            jnp.zeros((nq, keep), jnp.int32))
    best_v, best_r = jax.lax.fori_loop(0, nprobe, scan_probe, init)

    if refine and raw is not None:
        # exact rescore of the PQ top-(4k) shortlist
        vecs = raw[best_r]                        # (nq, keep, d)
        exact = jnp.einsum("nd,nkd->nk", q, vecs,
                           preferred_element_type=jnp.float32)
        exact = jnp.where(jnp.isfinite(best_v), exact, -jnp.inf)
        d2, sel = jax.lax.top_k(exact, k)
        ids = jnp.take_along_axis(ids_arr[best_r], sel, axis=1)
        return d2, jnp.where(jnp.isfinite(d2), ids, -1)
    d2 = best_v[:, :k]
    ids = ids_arr[best_r[:, :k]]
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

    def __init__(self, d: int = 128, nlist: int = 256, nprobe: int = 40):
        self.d, self.nlist, self.nprobe = d, nlist, nprobe
        self.ntotal = 0
        self._trained = False

    def train(self, data: np.ndarray, max_train: int = int(1e7),
              kmeans_iters: int = 10, seed: int = 0) -> None:
        data = np.asarray(data, np.float32)
        if len(data) > max_train:
            sel = np.random.default_rng(seed).permutation(len(data))[:max_train]
            data = data[sel]
        self.centroids = kmeans(jnp.asarray(data), self.nlist,
                                iters=kmeans_iters,
                                key=jax.random.PRNGKey(seed))
        self._trained = True

    def add(self, data: np.ndarray) -> None:
        assert self._trained, "train() before add()"
        data = np.asarray(data, np.float32)
        assign = assign_to_centroids(data, self.centroids)
        order = np.argsort(assign, kind="stable")
        sorted_data = data[order]
        counts = np.bincount(assign, minlength=self.nlist)
        self.list_cap = int(max(1, counts.max()))
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

        scales = np.maximum(np.abs(sorted_data).max(axis=1), 1e-12) / 127.0
        q8 = np.clip(np.round(sorted_data / scales[:, None]),
                     -127, 127).astype(np.int8)
        # pad the tail so a slice at the last list start is in-bounds
        pad = self.list_cap
        self.vecs8 = jnp.asarray(np.concatenate(
            [q8, np.zeros((pad, self.d), np.int8)]))
        self.scales = jnp.asarray(np.concatenate(
            [scales.astype(np.float32), np.zeros(pad, np.float32)]))
        self.starts = jnp.asarray(starts.astype(np.int32))
        self.ids = jnp.asarray(np.concatenate(
            [order.astype(np.int32), np.full(pad, -1, np.int32)]))
        self.ntotal = len(data)

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


# ---------------------------------------------------------------------------
def get_index(index_type: str, train_data: np.ndarray,
              max_train: int = int(1e7), nprobe: int = 40):
    """Index factory (counterpart of get_index, get_index_faiss.py:10-121).

    'l2'/'ip' exact; 'ivf' = IVF-PQ with near-lossless settings is not
    meaningfully distinct on TPU (matmul scan is exact) so it maps to the
    exact index; 'ivfpq' / 'ivfpq-rr' use the reference's compression
    parameters; 'ivf-sq8' is the TPU-native scalable index (int8 contiguous
    slice scans); 'hnsw' builds the native C++ graph index (host-side like
    the reference's CPU-only faiss.IndexHNSWFlat, M=16 efC=80).
    """
    t = index_type.lower()
    d = train_data.shape[1]
    if t in ("l2", "ip", "ivf"):
        return FlatIndex(train_data, metric="l2" if t == "l2" else "ip")
    if t in ("ivfpq", "ivfpq-rr"):
        idx = IVFPQIndex(d=d, nlist=256, m=64, nbits=8, nprobe=nprobe,
                         refine=(t == "ivfpq-rr"))
        idx.train(train_data, max_train=max_train)
        return idx
    if t == "ivf-sq8":
        idx = IVFSQ8Index(d=d, nlist=256, nprobe=nprobe)
        idx.train(train_data, max_train=max_train)
        return idx
    if t == "ivf-sq8-sharded":
        # the scalable index with every inverted list row-sharded over the
        # device mesh (capacity + per-probe compute scale with mesh size)
        from nafp_tpu.search.sharded import ShardedIVFSQ8Index
        idx = ShardedIVFSQ8Index(d=d, nlist=256, nprobe=nprobe)
        idx.train(train_data, max_train=max_train)
        return idx
    if t == "l2-sharded":
        # exact search with the DB row-sharded over the device mesh
        from nafp_tpu.search.sharded import ShardedFlatIndex
        return ShardedFlatIndex(train_data)
    if t == "hnsw":
        from nafp_tpu.native.hnsw import HNSWIndex
        return HNSWIndex(d=d, m=16, ef_construction=80)
    raise ValueError(index_type)
