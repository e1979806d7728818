"""Mesh-sharded search: the multi-chip flat and IVF-SQ8 indexes.

The full-scale protocol (100k-song dummy DB ≈ 53.6 M fingerprints, 27 GB
fp32) exceeds one chip's HBM. Here the DB rows are sharded over the
('data',) ICI mesh; a search replicates the query block, each device scans
its shard (matmul + local top-k), and a k-sized all-gather + merge yields
exact global results — per-query ICI traffic is R*k entries, not the DB.

``ShardedIVFSQ8Index`` applies the same merge to the scalable int8 index:
each inverted list's rows are dealt round-robin over the R devices, so a
probe scans ``ceil(cap/R)`` contiguous local rows per device — compute per
probe shrinks by R no matter which lists the queries hit (a list-granular
partition would idle devices whose lists aren't probed).

These are the TPU-native counterparts of FAISS's GPU sharding
(IndexShards/index_cpu_to_gpu_multiple); the reference itself never scaled
past one GPU (eval/utils/get_index_faiss.py:100-103 clones to one device).

Why there is NO sharded IVF-PQ (a reasoned no, by traffic math)
---------------------------------------------------------------
IVF-PQ's one selling point is HBM footprint: 64 B/vec of codes vs the sq8
family's ~137 B/vec (128 int8 + f32 scale + int32 id + f32 mask). But its
scan must DECODE before it can matmul: the one-hot decode materializes a
bf16 chunk (256 B/row) plus the one-hot dot operand, so per row scanned
it moves ~2.5x the bytes of the int8 scan — and measured end-to-end it is
strictly slower at every scale we run: 3,076 vs 5,375 QPS @ 2 M and 239
vs 2,922 QPS @ 53.6 M (one v5e chip, exact host GT, round 4). Sharding
divides rows per chip identically for both layouts, so the QPS ratio is
mesh-invariant; PQ can only win when capacity binds, i.e. when
rows/chip x 137 B exceeds the ~14 GB of usable HBM — above ~100 M rows
PER CHIP (≈ 800 M rows on a v4-8), 15x the reference's full 100x
protocol. Below that line sq8-sharded dominates on every axis (QPS,
recall=1.0 exactness, build time), so a sharded IVF-PQ would be dead
code with a maintenance surface; revisit only if corpora approach 1e9
rows per 8-chip pod slice.
"""
from __future__ import annotations


from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nafp_tpu.parallel.mesh import make_data_mesh
from nafp_tpu.search.index import IVFSQ8Index, _sq8_probe_scan


class ShardedFlatIndex:
    """Exact inner-product search over a row-sharded DB."""

    def __init__(self, db: np.ndarray, mesh: Optional[Mesh] = None):
        self.mesh = mesh or make_data_mesh()
        r = self.mesh.size
        n, d = db.shape
        self.ntotal = n
        pad = (-n) % r
        if pad:
            db = np.concatenate([db, np.zeros((pad, d), db.dtype)])
        self.shard_size = (n + pad) // r
        self.db = jax.device_put(jnp.asarray(db, jnp.float32),
                                 NamedSharding(self.mesh, P("data")))
        self._search_jit = {}

    def _build(self, k: int):
        shard_size, ntotal = self.shard_size, self.ntotal

        def local(q, db_shard):
            sim = jnp.dot(q, db_shard.T, preferred_element_type=jnp.float32)
            # mask pad rows of the last shard
            row0 = jax.lax.axis_index("data") * shard_size
            ids_local = jnp.arange(shard_size)[None, :] + row0
            sim = jnp.where(ids_local < ntotal, sim, -jnp.inf)
            v, i = jax.lax.top_k(sim, k)
            gid = jnp.take_along_axis(
                jnp.broadcast_to(ids_local, sim.shape), i, axis=1)
            # merge across shards: gather the R small candidate sets
            v_all = jax.lax.all_gather(v, "data", axis=1, tiled=True)
            g_all = jax.lax.all_gather(gid, "data", axis=1, tiled=True)
            vv, sel = jax.lax.top_k(v_all, k)
            ii = jnp.take_along_axis(g_all, sel, axis=1)
            return vv, ii

        fn = shard_map(local, mesh=self.mesh,
                       in_specs=(P(), P("data")), out_specs=(P(), P()),
                       check_vma=False)
        return jax.jit(fn)

    def search(self, q: np.ndarray, k: int,
               block: int = 1024) -> Tuple[np.ndarray, np.ndarray]:
        if k not in self._search_jit:
            self._search_jit[k] = self._build(k)
        fn = self._search_jit[k]
        q = np.asarray(q, np.float32)
        outs_d, outs_i = [], []
        for s in range(0, len(q), block):
            blk = q[s:s + block]
            pad = block - len(blk) if len(blk) < block and len(q) > block else 0
            if pad:
                blk = np.pad(blk, ((0, pad), (0, 0)))
            v, i = fn(jnp.asarray(blk), self.db)
            n = len(blk) - pad
            outs_d.append(np.asarray(v[:n]))
            outs_i.append(np.asarray(i[:n], np.int64))
        return np.concatenate(outs_d), np.concatenate(outs_i)

class ShardedSQ8FlatIndex:
    """Exact int8 full scan with the store row-sharded over the mesh.

    The multi-chip form of ``SQ8FlatIndex``: each device holds N/R rows of
    the int8 store and streams them through the fused Pallas kernel
    (``topk_ip_sq8_pallas``); a k-sized ``all_gather`` + merge yields exact
    global top-k. Capacity and scan time both scale with R — the v4-8
    north-star configuration holds 8× the store (or scans 8× faster) with
    per-query ICI traffic of R*k entries.
    """

    BLK = 2048

    def __init__(self, d: int = 128, mesh: Optional[Mesh] = None):
        self.d = d
        self.mesh = mesh or make_data_mesh()
        self.ntotal = 0
        self._trained = True
        self._search_jit = {}

    def train(self, data, **_) -> None:    # factory-contract no-op
        self._trained = True

    def add(self, data, block: int = 1 << 20,
            persist_path: Optional[str] = None) -> None:
        from nafp_tpu.search.index import _quantize_sq8_host
        R = self.mesh.size
        # pad so every shard is a whole number of kernel tiles
        q8, scales, ids = _quantize_sq8_host(data, R * self.BLK, block)
        self.ntotal = len(data)
        if persist_path:
            # single-device SQ8FlatIndex npz format: one store built once
            # loads onto any mesh size (or the single-device index)
            np.savez(persist_path, ntotal=self.ntotal, vecs8=q8,
                     scales=scales, ids=ids)
        self._publish(q8, scales, ids)

    def _publish(self, q8: np.ndarray, scales: np.ndarray,
                 ids: np.ndarray) -> None:
        """Shard a quantized store over the mesh, repadding so every shard
        is a whole number of kernel tiles (stores persisted by a different
        mesh size — or the single-device index — repad here)."""
        from nafp_tpu.search.index import _pad_sq8_store
        R = self.mesh.size
        q8, scales, ids = _pad_sq8_store(q8, scales, ids, R * self.BLK)
        put = lambda a: jax.device_put(jnp.asarray(a),
                                       NamedSharding(self.mesh, P("data")))
        self.vecs8 = put(q8)
        self.scales = put(scales)
        self.ids = put(ids)
        self.rmask = put(np.where(ids >= 0, 0.0, -1e30).astype(np.float32))

    @classmethod
    def load(cls, path: str, mesh: Optional[Mesh] = None
             ) -> "ShardedSQ8FlatIndex":
        """Load a store persisted by any of: this class's ``add``, the
        single-device ``SQ8FlatIndex.add``, or an IVF-SQ8 store npz (its
        sorted rows + original ids are exactly what a full scan needs) —
        the hours-long 100x-scale quantize happens once per corpus, not
        once per topology."""
        z = np.load(path)
        idx = cls(d=int(z["vecs8"].shape[1]), mesh=mesh)
        idx.ntotal = int(z["ntotal"])
        idx._publish(z["vecs8"], z["scales"], z["ids"])
        return idx

    def _build(self, k: int):
        from nafp_tpu.search.pallas_topk import topk_ip_sq8_pallas
        interpret = jax.default_backend() != "tpu"
        blk = self.BLK

        def local(q, vecs8, scales, rmask, ids):
            v, pos = topk_ip_sq8_pallas(q, vecs8, scales, rmask, k=k,
                                        blk=blk, interpret=interpret)
            gid = jnp.take(ids, jnp.maximum(pos, 0))
            gid = jnp.where(pos < 0, -1, gid)
            v_all = jax.lax.all_gather(v, "data", axis=1, tiled=True)
            g_all = jax.lax.all_gather(gid, "data", axis=1, tiled=True)
            vv, sel = jax.lax.top_k(v_all, k)
            ii = jnp.take_along_axis(g_all, sel, axis=1)
            return vv, jnp.where(ii >= 0, ii, -1)

        fn = shard_map(local, mesh=self.mesh,
                       in_specs=(P(), P("data"), P("data"), P("data"),
                                 P("data")),
                       out_specs=(P(), P()), check_vma=False)
        return jax.jit(fn)

    def search(self, q: np.ndarray, k: int,
               block: int = 1024) -> Tuple[np.ndarray, np.ndarray]:
        # kernel VMEM budget: see the sim-tile cap in pallas_topk (the
        # kernel raises its scoped-vmem limit for tiles past 4 MB)
        block = min(block, (16 << 20) // (self.BLK * 4))
        if k not in self._search_jit:
            self._search_jit[k] = self._build(k)
        fn = self._search_jit[k]
        q = np.asarray(q, np.float32)
        outs_d, outs_i = [], []
        for s in range(0, len(q), block):
            blk = q[s:s + block]
            pad = block - len(blk) if len(blk) < block and len(q) > block \
                else 0
            if pad:
                blk = np.pad(blk, ((0, pad), (0, 0)))
            v, i = fn(jnp.asarray(blk), self.vecs8, self.scales,
                      self.rmask, self.ids)
            n = len(blk) - pad
            outs_d.append(np.asarray(v[:n]))
            outs_i.append(np.asarray(i[:n]))
        return np.concatenate(outs_d), np.concatenate(outs_i)


class ShardedIVFSQ8Index(IVFSQ8Index):
    """IVF-SQ8 with every inverted list row-sharded over the device mesh.

    Layout: within each coarse list, row j goes to device ``j % R``; each
    device stores its share of every list contiguously (sorted by list),
    padded to a common length. A search replicates the queries, each device
    scans ``cap_local = ceil(cap/R)`` rows per probed list from its own
    shard, takes a local top-k, and one k-sized ``all_gather`` + merge
    yields the global result — identical candidate coverage to the
    single-device index over the probed lists, with per-device scan work
    cut by R.
    """

    def __init__(self, d: int = 128, nlist: Optional[int] = None,
                 nprobe: int = 40, mesh: Optional[Mesh] = None):
        super().__init__(d=d, nlist=nlist, nprobe=nprobe)
        self.mesh = mesh or make_data_mesh()
        self._search_jit = {}

    def add(self, data, block: int = 1 << 20,
            persist_path: Optional[str] = None) -> None:
        assert self._trained, "train() before add()"
        nlist, d = self.nlist, self.d
        n = len(data)
        # same one-pass quantize + int8-representation assignment as the
        # single-device index (streams off disk memmaps, 132 B/row shipped)
        from nafp_tpu.search.index import _assign_int8
        q8_flat = np.empty((n, d), np.int8)
        scales_flat = np.empty(n, np.float32)
        assign = np.empty(n, np.int32)
        for s in range(0, n, block):
            x = np.asarray(data[s:s + block], np.float32)
            sc = np.maximum(np.abs(x).max(axis=1), 1e-12) / 127.0
            q8_flat[s:s + block] = np.clip(
                np.round(x / sc[:, None]), -127, 127).astype(np.int8)
            scales_flat[s:s + block] = sc.astype(np.float32)
            assign[s:s + block] = _assign_int8(
                q8_flat[s:s + block], scales_flat[s:s + block],
                self.centroids)
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=nlist)
        cap_global = int(max(1, counts.max()))
        scales_all = scales_flat[order].astype(np.float32)
        q8_all = q8_flat[order]
        ids_all = order.astype(np.int32)
        del q8_flat, scales_flat

        if persist_path:
            # single-device IVFSQ8Index npz format: the store loads onto
            # any mesh size, the single-device index, or the sq8 flat scan
            pad = cap_global
            q8s = np.zeros((n + pad, d), np.int8)
            q8s[:n] = q8_all
            sc = np.zeros(n + pad, np.float32)
            sc[:n] = scales_all
            idp = np.full(n + pad, -1, np.int32)
            idp[:n] = ids_all
            starts_g = np.concatenate([[0], np.cumsum(counts)[:-1]])
            np.savez(persist_path, nlist=nlist, list_cap=cap_global,
                     ntotal=n, centroids=np.asarray(self.centroids),
                     vecs8=q8s, scales=sc,
                     starts=starts_g.astype(np.int32), ids=idp)
            del q8s
        self.ntotal = n
        self._publish_sharded(q8_all, scales_all, ids_all, counts,
                              cap_global)

    def _publish_sharded(self, q8_sorted: np.ndarray,
                         scales_sorted: np.ndarray, ids_sorted: np.ndarray,
                         counts: np.ndarray, cap_global: int) -> None:
        """Deal a list-sorted store round-robin over the mesh: within each
        coarse list, row j goes to device j % R; each device stores its
        share of every list contiguously."""
        R = self.mesh.size
        nlist, d = self.nlist, self.d
        n = len(q8_sorted)
        starts_g = np.concatenate([[0], np.cumsum(counts)[:-1]])
        sorted_assign = np.repeat(np.arange(nlist), counts)
        pos_in_list = np.arange(n) - starts_g[sorted_assign]
        dev_of_row = (pos_in_list % R).astype(np.int32)
        self.list_cap = (cap_global + R - 1) // R  # per-device slice length

        # rows of list l on device r: count = |{x in [0,counts[l]) : x%R==r}|
        local_counts = np.stack(
            [np.maximum(counts - r + R - 1, 0) // R for r in range(R)])

        l_max = int(local_counts.sum(axis=1).max()) + self.list_cap
        vecs8 = np.zeros((R, l_max, d), np.int8)
        scales = np.zeros((R, l_max), np.float32)
        ids = np.full((R, l_max), -1, np.int32)
        starts = np.zeros((R, nlist), np.int32)
        for r in range(R):
            sel = dev_of_row == r          # already in (list, pos) order
            nr = int(sel.sum())
            vecs8[r, :nr] = q8_sorted[sel]
            scales[r, :nr] = scales_sorted[sel]
            ids[r, :nr] = ids_sorted[sel]
            starts[r] = np.concatenate(
                [[0], np.cumsum(local_counts[r])[:-1]]).astype(np.int32)

        put = lambda a: jax.device_put(jnp.asarray(a),
                                       NamedSharding(self.mesh, P("data")))
        self.vecs8 = put(vecs8)
        self.scales = put(scales)
        self.ids = put(ids)
        self.starts = put(starts)
        self.centroids = jax.device_put(self.centroids,
                                        NamedSharding(self.mesh, P()))

    @classmethod
    def load(cls, path: str, nprobe: int = 40,
             mesh: Optional[Mesh] = None) -> "ShardedIVFSQ8Index":
        """Load a store persisted by this class's ``add`` or the
        single-device ``IVFSQ8Index.add`` — the round-robin shard layout
        is reconstructed from the list-sorted rows, so one store serves
        every mesh size."""
        z = np.load(path)
        idx = cls(d=int(z["centroids"].shape[1]), nlist=int(z["nlist"]),
                  nprobe=nprobe, mesh=mesh)
        idx.centroids = jnp.asarray(z["centroids"])
        idx._trained = True
        n = int(z["ntotal"])
        starts = np.asarray(z["starts"], np.int64)
        counts = np.diff(np.append(starts, n))
        idx.ntotal = n
        idx._publish_sharded(z["vecs8"][:n], np.asarray(z["scales"][:n],
                                                        np.float32),
                             np.asarray(z["ids"][:n], np.int32), counts,
                             int(z["list_cap"]))
        return idx

    def _build(self, k: int):
        nprobe, cap, d = self.nprobe, self.list_cap, self.d

        def local(q, centroids, vecs8, scales, ids, starts):
            vecs8, scales = vecs8[0], scales[0]   # drop unit shard axis
            ids, starts = ids[0], starts[0]
            q_cent = jnp.dot(q, centroids.T,
                             preferred_element_type=jnp.float32)
            _, probes = jax.lax.top_k(q_cent, nprobe)
            keep = min(2 * k, nprobe * cap)
            bv, bi = _sq8_probe_scan(q.astype(jnp.bfloat16), probes, q_cent,
                                     vecs8, scales, starts, ids,
                                     nprobe=nprobe, cap=cap, d=d, keep=keep)
            kk = min(k, keep)
            v, sel = jax.lax.top_k(bv, kk)
            i = jnp.take_along_axis(bi, sel, axis=1)
            v_all = jax.lax.all_gather(v, "data", axis=1, tiled=True)
            i_all = jax.lax.all_gather(i, "data", axis=1, tiled=True)
            vv, s2 = jax.lax.top_k(v_all, min(k, v_all.shape[1]))
            ii = jnp.take_along_axis(i_all, s2, axis=1)
            return vv, jnp.where(jnp.isfinite(vv), ii, -1)

        fn = shard_map(local, mesh=self.mesh,
                       in_specs=(P(), P(), P("data"), P("data"), P("data"),
                                 P("data")),
                       out_specs=(P(), P()), check_vma=False)
        return jax.jit(fn)

    def search(self, q: np.ndarray, k: int,
               block: int = 64) -> Tuple[np.ndarray, np.ndarray]:
        if k not in self._search_jit:
            self._search_jit[k] = self._build(k)
        fn = self._search_jit[k]
        q = np.asarray(q, np.float32)
        outs_d, outs_i = [], []
        for s in range(0, len(q), block):
            blk = q[s:s + block]
            pad = block - len(blk) if len(blk) < block and len(q) > block else 0
            if pad:
                blk = np.pad(blk, ((0, pad), (0, 0)))
            v, i = fn(jnp.asarray(blk), self.centroids, self.vecs8,
                      self.scales, self.ids, self.starts)
            n = len(blk) - pad
            outs_d.append(np.asarray(v[:n]))
            outs_i.append(np.asarray(i[:n]))
        return np.concatenate(outs_d), np.concatenate(outs_i)
