#!/usr/bin/env python
"""Search-throughput benchmark (secondary; the headline bench is bench.py).

Measures QPS for segment-level top-k over a synthetic fingerprint DB at a
configurable scale, across index types. North star (BASELINE.md): >= 1,000
QPS on the 100x DB on a v4-8; one v5e chip carries a proportional share.

Usage:
    python bench_search.py [--n 2000000] [--nq 2048] [--k 20]
                           [--index l2|ip|ivfpq|hnsw|pallas]
"""
import argparse
import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--nq", type=int, default=2048)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--index", default="ip")
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--recall", action="store_true",
                    help="also report recall@k of the true top-1 vs exact")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env var alone does not "
                         "override the TPU plugin; the tunnel is "
                         "single-tenant, so host-only runs must opt out)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    print(f"building DB: {args.n:,} x {args.d} ...", flush=True)
    db = rng.standard_normal((args.n, args.d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, args.n, args.nq)] + \
        0.05 * rng.standard_normal((args.nq, args.d)).astype(np.float32)

    t0 = time.perf_counter()
    if args.index == "pallas":
        import jax.numpy as jnp
        from nafp_tpu.search.pallas_topk import topk_ip_pallas
        db_dev = jnp.asarray(db)

        class _P:
            ntotal = args.n

            @staticmethod
            def search(qq, k):
                outs = []
                for s in range(0, len(qq), 512):
                    blk = np.asarray(qq[s:s + 512], np.float32)
                    v, i = topk_ip_pallas(jnp.asarray(blk), db_dev, k=k)
                    outs.append(np.asarray(i))
                return None, np.concatenate(outs)
        index = _P()
    elif args.index == "hnsw":
        from nafp_tpu.native.hnsw import HNSWIndex
        index = HNSWIndex(d=args.d)
        index.add(db)
    else:
        from nafp_tpu.search.index import get_index
        index = get_index(args.index, db)
        if hasattr(index, "add") and index.ntotal == 0:
            index.add(db)
    build_s = time.perf_counter() - t0

    # warm with the SAME shapes as the timed call (anything else compiles a
    # different executable and the timed call eats the compile)
    index.search(q, args.k)
    t0 = time.perf_counter()
    _, ids = index.search(q, args.k)
    dt = time.perf_counter() - t0

    recall = None
    if args.recall:
        # exact top-1 GT on the HOST (blocked torch sgemm): a FlatIndex GT
        # would ship the full f32 DB through the slow device link a second
        # time; one core does the 2048 x n x d GEMM in seconds.
        import torch
        torch.set_num_threads(1)
        qt = torch.from_numpy(np.ascontiguousarray(q))
        gt = np.full(len(q), -1, np.int64)
        gv = np.full(len(q), -np.inf, np.float32)
        for s in range(0, args.n, 1 << 20):
            e = min(s + (1 << 20), args.n)
            sim = qt @ torch.from_numpy(db[s:e]).T
            pv, pi = torch.max(sim, dim=1)
            pv, pi = pv.numpy(), pi.numpy().astype(np.int64) + s
            better = pv > gv
            gv = np.where(better, pv, gv)
            gt = np.where(better, pi, gt)
        recall = float(np.mean([gt[i] in ids[i] for i in range(len(q))]))

    print(json.dumps({
        "metric": "search_qps",
        "index": args.index,
        "n": args.n,
        "value": round(args.nq / dt, 1),
        "unit": "queries/sec",
        "build_sec": round(build_s, 2),
        "ms_per_query_batch": round(1000 * dt, 1),
        **({"recall_at_k": round(recall, 4)} if recall is not None else {}),
    }))


if __name__ == "__main__":
    main()
