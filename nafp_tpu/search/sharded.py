"""Mesh-sharded exact search: the multi-chip flat index.

The full-scale protocol (100k-song dummy DB ≈ 53.6 M fingerprints, 27 GB
fp32) exceeds one chip's HBM. Here the DB rows are sharded over the
('data',) ICI mesh; a search replicates the query block, each device scans
its shard (matmul + local top-k), and a k-sized all-gather + merge yields
exact global results — per-query ICI traffic is R*k entries, not the DB.

This is the TPU-native counterpart of FAISS's GPU sharding
(IndexShards/index_cpu_to_gpu_multiple); the reference itself never scaled
past one GPU.
"""
from __future__ import annotations


from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nafp_tpu.parallel.mesh import make_data_mesh


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
