#!/usr/bin/env python
"""The TRUE sequence-level ICASSP protocol at 100x scale.

``run_100x_protocol.py`` measures raw ANN QPS/recall on IID vectors; the
reference's 100k-song evaluation is the *sequence* eval — per-segment
top-k, offset compensation, diagonal re-ranking over a real dummy_db
(``eval/eval_faiss.py:147-148,204-243``). This runner synthesizes
SONG-STRUCTURED fingerprints (unit-sphere random walks, so hop-adjacent
segments correlate like real 0.5 s-hop fingerprints do) at the full scale
(default 100k dummy songs x 536 segs = 53.6 M rows + the 500-song
query/db set) and drives ``eval_fingerprints`` end to end with the fixed
ICASSP test ids — exercising the on-disk merged recon
(``search/evaluate.py``) and host-side rescoring at the scale they were
written for.

Song model: x_0 ~ uniform(S^127); x_{t+1} = normalize(a·x_t + √(1−a²)·ε).
``a`` (default 0.7) sets the hop-adjacent cosine, matching the qualitative
correlation of real fingerprints (half the audio is shared between
neighboring 1 s windows at 0.5 s hop). Queries are per-segment noisy
copies of db rows: q = normalize(db + s·ε); the default s=0.066 gives
cos(q, db) ≈ 0.80 — a challenging-but-learnable per-segment operating
point so the sequence re-ranker's length curve is informative (the max
impostor cosine among ~5e7 walk vectors concentrates near
sqrt(2 ln N / d) ≈ 0.53, and a query's own hop-neighbors sit near
0.7·0.80 = 0.56).

Stages (skipped when their artifact exists):
  gen   — dummy_db.mm / db.mm / query.mm (+ *_shape.npy) under ROOT.
  eval  — eval_fingerprints(index, test_ids='icassp'); the ivf-sq8 store
          is persisted so a rerun skips the hours-long add.

Usage:
    python extras/run_100x_sequence.py [--root /tmp/nafp_seq100x]
        [--n_dummy_songs 100000] [--segs_per_song 536] [--index ivf-sq8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")

D = 128


def _write_walks(path_base: str, n_songs: int, segs: int, alpha: float,
                 rng: np.random.Generator, song_chunk: int = 4096) -> None:
    """Write (n_songs*segs, D) unit random-walk fingerprints as {base}.mm
    + {base}_shape.npy, blockwise (no full array in RAM).

    PERF: warm reused buffers + sequential ``tofile`` writes, NOT a
    memmap store and NOT fresh per-chunk allocations — on this VM's
    on-demand (VMM-backed) memory a first-touch page fault costs ~1 ms,
    which makes memmap stores run at 4.7 MB/s (vs 123 MB/s for plain
    write()) and fresh-buffer RNG at 9 MB/s (vs 170 MB/s into a warm
    buffer). Measured; see CLAUDE.md."""
    n = n_songs * segs
    beta = float(np.sqrt(1.0 - alpha * alpha))
    block = np.empty((song_chunk, segs, D), np.float32)
    x = np.empty((song_chunk, D), np.float32)
    eps = np.empty((song_chunk, D), np.float32)
    nrm = np.empty(song_chunk, np.float32)

    def _unitize(v, nv):
        np.sqrt(np.einsum("nd,nd->n", v, v, optimize=True), out=nv)
        v /= nv[:, None]

    t0 = time.perf_counter()
    with open(path_base + ".mm", "wb") as f:
        for s0 in range(0, n_songs, song_chunk):
            ns = min(song_chunk, n_songs - s0)
            xv, ev, bv, nv = x[:ns], eps[:ns], block[:ns], nrm[:ns]
            rng.standard_normal((ns, D), dtype=np.float32, out=xv)
            _unitize(xv, nv)
            bv[:, 0] = xv
            for t in range(1, segs):
                rng.standard_normal((ns, D), dtype=np.float32, out=ev)
                np.multiply(xv, alpha, out=xv)
                np.multiply(ev, beta, out=ev)
                np.add(xv, ev, out=xv)
                _unitize(xv, nv)
                bv[:, t] = xv
            bv.tofile(f)
            print(f"  {path_base}: {(s0 + ns):,}/{n_songs:,} songs "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    np.save(path_base + "_shape.npy", np.asarray((n, D)))


def _write_queries(root: str, n_db_songs: int, db_segs: int,
                   noise: float) -> None:
    db = np.memmap(os.path.join(root, "db.mm"), np.float32, "r",
                   shape=(n_db_songs * db_segs, D))
    rng = np.random.default_rng(777)
    q = np.asarray(db) + noise * rng.standard_normal(
        (len(db), D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qmm = np.memmap(os.path.join(root, "query.mm"), np.float32, "w+",
                    shape=q.shape)
    qmm[:] = q
    qmm.flush()
    np.save(os.path.join(root, "query_shape.npy"), np.asarray(q.shape))
    cos = float(np.mean(np.sum(q * db, axis=1)))
    print(f"[gen] query cos(q, db) mean = {cos:.4f}", flush=True)


def stage_gen(root: str, n_dummy_songs: int, dummy_segs: int,
              n_db_songs: int, db_segs: int, alpha: float,
              noise: float) -> None:
    done = os.path.join(root, "gen.done.json")
    want = dict(n_dummy_songs=n_dummy_songs, dummy_segs=dummy_segs,
                n_db_songs=n_db_songs, db_segs=db_segs, alpha=alpha,
                noise=noise)
    have = json.load(open(done)) if os.path.exists(done) else None
    if have == want:
        print("[gen] exists", flush=True)
        return
    if have is not None and {k: v for k, v in have.items() if k != "noise"} \
            == {k: v for k, v in want.items() if k != "noise"}:
        # only the query noise changed: the dummy/db walks (and any
        # persisted index store built from them) are reusable — rewrite
        # just query.mm for the new operating point
        print(f"[gen] noise {have['noise']} -> {noise}: regenerating "
              "queries only", flush=True)
        _write_queries(root, n_db_songs, db_segs, noise)
        with open(done, "w") as f:
            json.dump(want, f)
        return
    print(f"[gen] dummy_db {n_dummy_songs:,} songs x {dummy_segs} segs "
          f"({n_dummy_songs * dummy_segs * D * 4 / 2**30:.1f} GiB)",
          flush=True)
    rng = np.random.default_rng(2024)
    _write_walks(os.path.join(root, "dummy_db"), n_dummy_songs, dummy_segs,
                 alpha, rng)
    print(f"[gen] db {n_db_songs} songs x {db_segs} segs", flush=True)
    _write_walks(os.path.join(root, "db"), n_db_songs, db_segs, alpha, rng)
    _write_queries(root, n_db_songs, db_segs, noise)
    with open(done, "w") as f:
        json.dump(want, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/nafp_seq100x")
    ap.add_argument("--n_dummy_songs", type=int, default=100_000)
    ap.add_argument("--segs_per_song", type=int, default=536)
    ap.add_argument("--n_db_songs", type=int, default=500)
    ap.add_argument("--db_segs", type=int, default=59)   # 30 s @ 0.5 s hop
    ap.add_argument("--alpha", type=float, default=0.7)
    ap.add_argument("--noise", type=float, default=0.066)
    ap.add_argument("--index", default="ivf-sq8")
    ap.add_argument("--nprobe", type=int, default=40,
                    help="probed lists for the IVF family (the r3 table "
                         "used 40 = a 0.907-recall point; 96 ~ 0.967)")
    ap.add_argument("--test_ids", default="icassp")
    ap.add_argument("--stages", default="gen,eval")
    args = ap.parse_args()
    os.makedirs(args.root, exist_ok=True)
    stages = set(args.stages.split(","))

    if "gen" in stages:
        stage_gen(args.root, args.n_dummy_songs, args.segs_per_song,
                  args.n_db_songs, args.db_segs, args.alpha, args.noise)

    if "eval" in stages:
        from nafp_tpu.search.evaluate import eval_fingerprints
        # sq8 (exact full scan) reuses the ivf-sq8 store file: sorted int8
        # rows + original-row ids are exactly what the flat scan needs, so
        # the hours-long quantize+persist is shared between the two evals
        cache = (os.path.join(args.root, "ivf-sq8_store.npz")
                 if args.index in ("ivf-sq8", "sq8") else None)
        rates = eval_fingerprints(
            args.root, emb_dummy_dir=args.root, index_type=args.index,
            test_ids=args.test_ids, nprobe=args.nprobe, index_cache=cache)
        summary = json.load(open(os.path.join(args.root,
                                              "eval_summary.json")))
        line = {"protocol": "100x-sequence", "alpha": args.alpha,
                "noise": args.noise, **summary}
        with open(os.path.join(args.root, "results.jsonl"), "a") as f:
            f.write(json.dumps(line) + "\n")
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
