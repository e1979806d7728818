#!/usr/bin/env python
"""HNSW parity sweep (VERDICT r4 item 8): efConstruction x efSearch at
500 k rows, with save/load round-trip timing.

faiss-cpu is not installable on this box (no network); the comparison
anchor is faiss's typical IndexHNSWFlat(M=16, efC=80) operating point of
recall@20 >= 0.95 at efSearch 128 on ~IID vectors. This sweep measures our
graph at efC {80, 200} against exact host GT and records the curve either
way — if the heuristic graph tops out lower, the row closes as "parity at
settings X" with numbers.

Results append to RESULTS (default /tmp/nafp_hnsw/results.jsonl). The
built graphs persist via hnsw save/load, so re-sweeps skip the build.

Usage:
    python extras/bench_hnsw.py [--n 500000] [--nq 2048] [--k 20]
        [--ef_construction 80,200] [--ef_search 64,128,256,512]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = 128


# recall is measured against top-1 only; reuse the canonical qhash-keyed
# helper instead of a shape-validated local cache (a shape-only check
# silently reuses stale GT when the query construction changes)
from extras.run_100x_protocol import exact_gt_host  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--nq", type=int, default=2048)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--ef_construction", default="80,200")
    ap.add_argument("--ef_search", default="64,128,256,512")
    ap.add_argument("--threads", type=int, default=1,
                    help="build threads (this host has 1 core; >1 only "
                         "helps on multi-core deployments)")
    ap.add_argument("--root", default="/tmp/nafp_hnsw")
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)
    from nafp_tpu.native.hnsw import HNSWIndex

    rng = np.random.default_rng(0)
    db = rng.standard_normal((args.n, D)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.integers(0, args.n, args.nq)] + \
        0.05 * rng.standard_normal((args.nq, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gt1, _, _ = exact_gt_host(db, q, args.root)

    results_path = os.path.join(args.root, "results.jsonl")
    for efc in map(int, args.ef_construction.split(",")):
        graph = os.path.join(args.root, f"hnsw_n{args.n}_m{args.m}_"
                                        f"efc{efc}.bin")
        if os.path.exists(graph):
            t0 = time.perf_counter()
            idx = HNSWIndex.load(graph)
            t_build, cached = time.perf_counter() - t0, True
            print(f"[build] loaded {graph} in {t_build:.0f}s", flush=True)
            assert idx.ntotal == args.n
        else:
            idx = HNSWIndex(d=D, m=args.m, ef_construction=efc)
            t0 = time.perf_counter()
            idx.add(db, threads=args.threads)
            t_build, cached = time.perf_counter() - t0, False
            t0 = time.perf_counter()
            idx.save(graph)
            print(f"[build] efC={efc}: built in {t_build:.0f}s, saved in "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
        for ef in map(int, args.ef_search.split(",")):
            idx.search(q[:64], args.k, ef_search=ef)   # warm
            t0 = time.perf_counter()
            _, ids = idx.search(q, args.k, ef_search=ef)
            dt = time.perf_counter() - t0
            rec = float(np.mean([gt1[i] in ids[i] for i in range(len(q))]))
            row = {"index": "hnsw", "n": args.n, "m": args.m, "efc": efc,
                   "ef_search": ef, "qps": round(args.nq / dt, 1),
                   "recall_at_k": round(rec, 4), "k": args.k,
                   "build_sec": round(t_build, 1), "build_cached": cached,
                   "threads": args.threads}
            with open(results_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
