#!/usr/bin/env python
"""Search-throughput benchmark (secondary; the headline bench is bench.py).

Measures QPS for segment-level top-k over a synthetic fingerprint DB at a
configurable scale, across index types. North star (BASELINE.md): >= 1,000
QPS on the 100x DB on a v4-8; one v5e chip carries a proportional share.

Usage:
    python bench_search.py [--n 2000000] [--nq 2048] [--k 20]
                           [--index l2|ip|ivfpq|hnsw|pallas]
    python bench_search.py --suite       # driver-visible regression rows

``--suite`` measures {sq8, ivfpq, ivfpq-rr, ivf-sq8} at a fixed 2 M-row
scale plus hnsw (ef 64/128/256) at --hnsw_n (500 k default — the graph
build is single-thread host C++), all against EXACT host ground truth,
persisting the DB + built stores/graph under --root (rebuild-on-miss),
and writes the rows to SEARCH_BENCH.json — so search-QPS regressions are
captured in round artifacts the way bench.py captures encoder throughput
(VERDICT r3 weak #5 / r4 weak #2: ivfpq-rr and hnsw numbers previously
lived only in README prose and /tmp stores a VM reset deletes).
"""
import argparse
import json
import os
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def run_suite(args):
    sys.path.insert(0, REPO)
    from extras.run_100x_protocol import (exact_gt_host, load_mm,
                                          make_queries, stage_build,
                                          stage_gen)
    root = args.root
    os.makedirs(root, exist_ok=True)
    stage_gen(root, args.n)
    mm = load_mm(root)
    q, pick = make_queries(mm, args.nq)
    gt, _, _ = exact_gt_host(mm, q, root)      # cached after first run
    rows = []
    for index in ("sq8", "ivfpq", "ivfpq-rr", "ivf-sq8"):
        out = {}
        idx = stage_build(root, out, index=index)
        if hasattr(idx, "nprobe"):
            idx.nprobe = args.nprobe
        idx.search(q, args.k)                  # warm with identical shapes
        t0 = time.perf_counter()
        _, ids = idx.search(q, args.k)
        dt = time.perf_counter() - t0
        recall = float(np.mean([gt[i] in ids[i] for i in range(len(q))]))
        row = {"metric": "search_qps", "index": index, "n": args.n,
               "value": round(args.nq / dt, 1), "unit": "queries/sec",
               "k": args.k, "recall_at_k": round(recall, 4),
               **({"nprobe": args.nprobe} if hasattr(idx, "nprobe") else {}),
               **{kk: out[kk] for kk in ("train_sec", "add_sec",
                                         "build_cached") if kk in out}}
        rows.append(row)
        print(json.dumps(row), flush=True)
        del idx
    if not args.no_hnsw:
        rows.extend(_suite_hnsw(args, mm, q))
    with open(args.out, "w") as f:
        json.dump({"suite": rows, "n": args.n, "nq": args.nq,
                   "gt": "host-exact",
                   "backend": jax.default_backend()}, f, indent=1)
    print(f"wrote {args.out}", flush=True)


def _suite_hnsw(args, mm, q):
    """HNSW suite rows at --hnsw_n (host-side single-thread C++, so the
    2 M scale the device indexes use is not suite-feasible: the measured
    efC-200 build is ~2,000 s at 500 k already). The built graph persists
    under --root, so only the first run after a VM reset pays the build.
    QPS here is clean by construction when the suite runs alone — the
    prior published HNSW QPS was measured niced under TPU-training
    contention and only its recall column was trusted (VERDICT r4 #4)."""
    from nafp_tpu.native.hnsw import HNSWIndex
    n = min(args.hnsw_n, len(mm))
    sub = np.asarray(mm[:n], np.float32)
    # exact GT on the sub-DB (host torch sgemm; cached)
    gt_path = os.path.join(args.root, f"gt_hnsw_{n}.npy")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
    else:
        import torch
        torch.set_num_threads(1)
        qt = torch.from_numpy(np.ascontiguousarray(q))
        gt = np.full(len(q), -1, np.int64)
        gv = np.full(len(q), -np.inf, np.float32)
        for s in range(0, n, 1 << 20):
            e = min(s + (1 << 20), n)
            sim = qt @ torch.from_numpy(sub[s:e]).T
            pv, pi = torch.max(sim, dim=1)
            pv, pi = pv.numpy(), pi.numpy().astype(np.int64) + s
            better = pv > gv
            gv = np.where(better, pv, gv)
            gt = np.where(better, pi, gt)
        np.save(gt_path, gt)
    graph = os.path.join(args.root, f"hnsw_{n}_efc200.bin")
    if os.path.exists(graph):
        idx = HNSWIndex.load(graph)
        build = {"build_cached": True}
        print(f"[hnsw] loaded persisted graph {graph}", flush=True)
    else:
        idx = HNSWIndex(d=sub.shape[1], m=16, ef_construction=200)
        t0 = time.perf_counter()
        idx.add(sub)
        build = {"build_sec": round(time.perf_counter() - t0, 1)}
        idx.save(graph)
        print(f"[hnsw] built + persisted {graph} "
              f"({build['build_sec']}s)", flush=True)
    rows = []
    for ef in (64, 128, 256):
        idx.search(q[:64], args.k, ef_search=ef)          # warm
        t0 = time.perf_counter()
        _, ids = idx.search(q, args.k, ef_search=ef)
        dt = time.perf_counter() - t0
        recall = float(np.mean([gt[i] in ids[i] for i in range(len(q))]))
        row = {"metric": "search_qps", "index": "hnsw", "n": n,
               "value": round(args.nq / dt, 1), "unit": "queries/sec",
               "k": args.k, "recall_at_k": round(recall, 4),
               "ef_search": ef, "ef_construction": 200, **build}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


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
    ap.add_argument("--suite", action="store_true",
                    help="measure the fixed regression suite ({sq8, ivfpq, "
                         "ivfpq-rr, ivf-sq8} @ --n rows + hnsw @ --hnsw_n, "
                         "exact GT) and write SEARCH_BENCH.json")
    ap.add_argument("--root", default="/tmp/nafp_bench2m",
                    help="suite artifact dir (DB memmap + built stores; "
                         "rebuild-on-miss)")
    ap.add_argument("--nprobe", type=int, default=40)
    ap.add_argument("--hnsw_n", type=int, default=500_000,
                    help="suite scale for the host-side hnsw rows (the "
                         "graph build is single-thread C++; 2 M is not "
                         "suite-feasible)")
    ap.add_argument("--no_hnsw", action="store_true",
                    help="skip the hnsw suite rows (e.g. while a TPU "
                         "training owns the host core — hnsw QPS is "
                         "host-CPU-bound and would be contaminated)")
    ap.add_argument("--out", default=os.path.join(REPO, "SEARCH_BENCH.json"))
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.suite:
        return run_suite(args)

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
