"""Segment/sequence-level search evaluation.

Counterpart of reference ``eval/eval_faiss.py:93-275``, restructured for
batch execution: the reference loops one query sequence at a time through
FAISS + numpy; here every (test_id, seq_len) pair in a block is evaluated
with device-side candidate scoring.

Protocol (kept bit-faithful):
  - index contains dummy_db then db, so ground truth for query i is
    ``i + len(dummy_db)`` (eval_faiss.py:121-148);
  - per segment top-k (k_probe=20), candidate starts = hit id − segment
    offset (:211-216), negatives dropped, duplicates deduped (:219);
  - sequence score = mean of diag(q · cand_window) over the raw vectors
    (:222-229) — the 'fake_recon' merged array, built here as a separate
    concat instead of mutating dummy_db.mm in place (the reference's ⚠);
  - metrics: top1-exact, top1-near(±1), top3, top10 per seq_len (:236-243);
  - outputs ``raw_score.npy`` (n_test, 4*len(seq_lens)) and
    ``test_ids.npy`` (:271-274).

The data-dependent 'unique candidates' step becomes static-shaped: sort the
sl*k candidate list, mask duplicates/-1s to -inf before the final top-k.

Tail test ids (at most seq_len−1 of them per length) have fewer than sl
segments; their missing rows are zero-padded into the static-shape search
batch and the hits masked after. The padded rows are searched — that waste
is bounded by (sl−1)·sl·k_probe rows per protocol run, far below what a
dynamic-shape recompile would cost.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nafp_tpu.data.audio_io import load_memmap
from nafp_tpu.search.index import get_index
from nafp_tpu.search.table import LiveTable, print_results_table


@functools.partial(jax.jit, static_argnames=("sl",))
def _score_candidates(q_seq: jax.Array, cands: jax.Array,
                      recon: jax.Array, sl: int, n_seg: jax.Array):
    """Sequence scores for candidate start ids.

    q_seq: (B, sl, d) with rows past n_seg zeroed; cands: (B, C) candidate
    start ids (-1 = invalid); recon: (N, d) raw vectors; n_seg: (B,) valid
    segments per query (test ids near the end of the query set have fewer —
    the reference searches the truncated sequence, eval_faiss.py:208).
    Returns (B, C) scores with duplicates and invalid entries at -inf.
    """
    n = recon.shape[0]
    # dedup: sort ids, mark repeats
    cands_sorted = jnp.sort(cands, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(cands_sorted[:, :1], bool),
         cands_sorted[:, 1:] == cands_sorted[:, :-1]], axis=1)
    # Validity is per-row against the TRUNCATED query length: a tail test id
    # with n_seg < sl segments must still match a DB window of n_seg rows
    # near the DB end (the reference scores the shorter diagonal,
    # eval_faiss.py:222-229). Window rows past n_seg contribute 0 because
    # q_seq is zeroed there; clamped duplicate rows are likewise inert.
    invalid = (cands_sorted < 0) | (cands_sorted + n_seg[:, None] > n) | dup

    safe = jnp.clip(cands_sorted, 0, n - 1)
    win_idx = safe[:, :, None] + jnp.arange(sl)[None, None, :]  # (B, C, sl)
    windows = recon[jnp.minimum(win_idx, n - 1)]                # (B,C,sl,d)
    scores = jnp.einsum("bod,bcod->bc", q_seq, windows,
                        preferred_element_type=jnp.float32) \
        / n_seg[:, None].astype(jnp.float32)
    return jnp.where(invalid, -jnp.inf, scores), cands_sorted


def _score_candidates_host(q_seq, cands, recon, sl, n_seg):
    """Numpy mirror of _score_candidates for DBs too large for HBM: gathers
    candidate windows from the host (memmap-backed) raw-vector array."""
    n = recon.shape[0]
    cands_sorted = np.sort(cands, axis=1)
    dup = np.concatenate([np.zeros_like(cands_sorted[:, :1], bool),
                          cands_sorted[:, 1:] == cands_sorted[:, :-1]], axis=1)
    # mirror of _score_candidates: per-row truncated-length validity
    invalid = (cands_sorted < 0) | (cands_sorted + n_seg[:, None] > n) | dup
    safe = np.clip(cands_sorted, 0, n - 1)
    win_idx = np.minimum(safe[:, :, None] + np.arange(sl)[None, None, :],
                         n - 1)
    windows = recon[win_idx]                                    # (B,C,sl,d)
    scores = np.einsum("bod,bcod->bc", q_seq, windows) \
        / n_seg[:, None].astype(np.float64)
    scores[invalid] = -np.inf
    return scores, cands_sorted


# Above this size the merged dummy_db+db array lives on disk, not RAM.
MERGE_RAM_LIMIT = 8 << 30


def _icassp_asset_path() -> str:
    """Path of the packaged ICASSP-2021 test-id asset. Resolved from the
    package only — no CWD-wide globbing (a recursive ./** walk is O(tree)
    and can silently pick up an unrelated fixture copy). Raises with a
    clear message when the asset is missing."""
    asset = os.path.normpath(os.path.join(
        os.path.dirname(__file__), os.pardir, "assets",
        "test_ids_icassp2021.npy"))
    if not os.path.exists(asset):
        raise FileNotFoundError(
            f"packaged ICASSP test-id asset missing at {asset}; pass "
            "test_ids='all', an integer count, or a path to a .npy file")
    return asset


def _merged_recon(emb_dir: str, dummy_db, db) -> np.ndarray:
    """Merged [dummy_db; db] raw-vector array for index build + rescoring.

    Counterpart of the reference's 'fake_recon_index' (eval_faiss.py:163-174)
    but WITHOUT mutating dummy_db.mm in place. Small DBs are concatenated in
    RAM; past MERGE_RAM_LIMIT the merge is an on-disk memmap written
    blockwise (peak RAM stays O(block), not O(2N) as a concatenate would).
    """
    n_d, n_q = len(dummy_db), len(db)
    d = db.shape[1]
    total_bytes = (n_d + n_q) * d * 4
    if total_bytes <= MERGE_RAM_LIMIT:
        return np.concatenate([np.asarray(dummy_db), np.asarray(db)])
    path = os.path.join(emb_dir, "merged_recon.mm")
    shape = (n_d + n_q, d)
    if os.path.exists(path) and os.path.getsize(path) == total_bytes:
        print(f"reusing merged recon memmap {path}")
        return np.memmap(path, np.float32, mode="r", shape=shape)
    # Sequential write(), not a memmap store: on VMM-backed on-demand
    # memory a fresh memmap page store faults at ~1 ms/page (measured
    # 4.7 MB/s vs 123 MB/s for write(); CLAUDE.md r3 notes).
    blk = 1 << 20
    buf = np.empty((blk, d), np.float32)   # warm buffer: fresh per-block
    with open(path, "wb") as f:            # allocations refault every page
        for src, n_src in ((dummy_db, n_d), (db, n_q)):
            for s in range(0, n_src, blk):
                e = min(s + blk, n_src)
                v = buf[:e - s]
                v[:] = src[s:e]
                v.tofile(f)
    return np.memmap(path, np.float32, mode="r", shape=shape)


def _hits_for_block(index, recon_dev, recon_host, query, ids_block, sl,
                    k_probe):
    """Returns the (B, 10) ranked candidate start ids for a block of test
    ids at one sequence length."""
    b = len(ids_block)
    d = query.shape[1]
    # Tail ids have fewer than sl segments; pad with zero rows and track the
    # per-id valid count (reference searches the truncated slice, :208).
    q_seq = np.zeros((b, sl, d), np.float32)
    n_seg = np.minimum(len(query) - ids_block, sl).astype(np.int32)
    for j, t in enumerate(ids_block):
        q_seq[j, :n_seg[j]] = query[t:t + n_seg[j]]
    _, hit_ids = index.search(q_seq.reshape(-1, d), k_probe)
    hit_ids = hit_ids.reshape(b, sl, k_probe)
    # drop hits from padded (zero) segments
    seg_valid = np.arange(sl)[None, :] < n_seg[:, None]
    hit_ids = np.where(seg_valid[:, :, None], hit_ids, -1)
    # offset compensation (eval_faiss.py:215-216); ignore id<0 (:219)
    starts = hit_ids - np.arange(sl)[None, :, None]
    starts = np.where(hit_ids < 0, -1, starts)
    cands = starts.reshape(b, sl * k_probe)

    if recon_dev is not None:
        scores, cands_sorted = _score_candidates(
            jnp.asarray(q_seq), jnp.asarray(cands), recon_dev, sl,
            jnp.asarray(n_seg))
        k10 = min(10, scores.shape[1])
        top_scores, pos = jax.lax.top_k(scores, k10)
        pred = np.asarray(jnp.take_along_axis(cands_sorted, pos, axis=1))
        valid = np.isfinite(np.asarray(top_scores))
    else:
        scores, cands_sorted = _score_candidates_host(q_seq, cands,
                                                       recon_host, sl, n_seg)
        k10 = min(10, scores.shape[1])
        pos = np.argsort(-scores, axis=1)[:, :k10]
        top_scores = np.take_along_axis(scores, pos, axis=1)
        pred = np.take_along_axis(cands_sorted, pos, axis=1)
        valid = np.isfinite(top_scores)
    pred = np.where(valid, pred, -999999)
    return pred  # (B, 10) ranked candidate start ids


def _cacheable_cls(index_type: str, nprobe: int):
    """Single registry: nafp_tpu.search.index.cacheable_cls (kept as a
    module-local alias for the existing call site / tests)."""
    from nafp_tpu.search.index import cacheable_cls
    return cacheable_cls(index_type, nprobe)


def eval_fingerprints(emb_dir: str,
                      emb_dummy_dir: Optional[str] = None,
                      index_type: str = "ivfpq",
                      test_ids: str = "icassp",
                      test_seq_len: str = "1 3 5 9 11 19",
                      k_probe: int = 20,
                      max_train: int = int(1e7),
                      nprobe: int = 40,
                      display_interval: int = 10,
                      seed: int = 42,
                      index_cache: Optional[str] = None,
                      ef_search: int = 64) -> np.ndarray:
    """Run the full search experiment; returns hit-rate matrix
    (4, n_seq_len) in percent and writes raw_score.npy / test_ids.npy /
    eval_summary.json.

    ``nprobe``: probed coarse lists for the IVF family (reference default
    40, ``get_index_faiss.py:120``); ignored by exact indexes.

    ``ef_search``: query-time beam width for the hnsw index (every
    published recall point is now reachable from the CLI); ignored by the
    other families.

    ``index_cache``: npz path for the built int8-family store (ivf-sq8 /
    sq8 / the sharded twins) — loaded when present (skipping the
    hours-long 100x-scale add), written after a fresh build. Ignored for
    other index types."""
    seq_lens = np.asarray(list(map(int, str(test_seq_len).split())))

    query, query_shape = load_memmap(emb_dir, "query")
    db, db_shape = load_memmap(emb_dir, "db")
    dummy_dir = emb_dummy_dir or emb_dir
    dummy_db, dummy_shape = load_memmap(dummy_dir, "dummy_db")

    n_dummy = int(dummy_shape[0])
    full_db = _merged_recon(emb_dir, dummy_db, db)
    del dummy_db

    t0 = time.time()
    index = None
    cache_cls, load_kwargs = _cacheable_cls(index_type, nprobe)
    if index_cache and cache_cls is not None \
            and os.path.exists(index_cache):
        try:
            if int(np.load(index_cache)["ntotal"]) == len(full_db):
                index = cache_cls.load(index_cache, **load_kwargs)
                print(f"loaded persisted {index_type} store {index_cache}")
        except Exception as e:     # partial write from a killed run
            print(f"ignoring unreadable index cache {index_cache}: {e}")
    if index is None:
        index = get_index(index_type, full_db, max_train=max_train,
                          nprobe=nprobe, ef_search=ef_search)
        if hasattr(index, "add") and index.ntotal == 0:
            if index_cache and cache_cls is not None:
                index.add(full_db, persist_path=index_cache)
            else:
                index.add(full_db)
    elif hasattr(index, "nprobe"):
        index.nprobe = nprobe
    t_build = time.time() - t0
    print(f"index[{index_type}] over {len(full_db):,} items "
          f"({t_build:.2f}s)")
    # Raw vectors for sequence rescoring: device-resident when they fit
    # comfortably in HBM, host (memmap-backed) gather otherwise — the 100x
    # protocol (53.6M x 128 f32 = 27 GB) cannot live on one chip. The
    # budget is live headroom (half the free HBM AFTER the index store was
    # built, via device_memory_stats), not a constant, so a device-heavy
    # index shrinks it automatically; 4 GiB is the no-stats fallback.
    from nafp_tpu.utils.device import device_recon_budget
    device_recon_limit = device_recon_budget()
    recon_dev = (jnp.asarray(full_db)
                 if full_db.nbytes <= device_recon_limit else None)
    if recon_dev is None:
        print(f"recon array {full_db.nbytes / 2**30:.1f} GiB > "
              f"budget {device_recon_limit / 2**30:.1f} GiB: "
              "host-side rescoring")

    # test ids (eval_faiss.py:177-186)
    query = np.asarray(query, np.float32)
    if isinstance(test_ids, str) and test_ids.lower() == "all":
        ids = np.arange(0, len(query) - int(seq_lens.max()), 1)
    elif isinstance(test_ids, str) and test_ids.lower() == "icassp":
        ids = np.load(_icassp_asset_path())
    elif isinstance(test_ids, str) and test_ids.isnumeric():
        rng = np.random.default_rng(seed)
        ids = rng.permutation(len(query) - int(seq_lens.max()))[:int(test_ids)]
    else:
        ids = np.load(test_ids)
    ids = np.asarray(ids, np.int64)
    n_test = len(ids)
    gt = ids + n_dummy
    print(f"test_id: {test_ids},  n_test: {n_test}")

    top1_exact = np.zeros((n_test, len(seq_lens)), int)
    top1_near = np.zeros((n_test, len(seq_lens)), int)
    top3_exact = np.zeros((n_test, len(seq_lens)), int)
    top10_exact = np.zeros((n_test, len(seq_lens)), int)

    t_start = time.time()
    n_searches = 0
    block = 128
    # live display: curses table on a TTY, rolling line otherwise
    # (counterpart of PrintTable, eval/utils/print_table.py:7-110)
    with LiveTable(seq_lens) as table:
        for si, sl in enumerate(seq_lens):
            for s in range(0, n_test, block):
                ids_block = ids[s:s + block]
                pred = _hits_for_block(index, recon_dev, full_db, query,
                                       ids_block, int(sl), k_probe)
                g = gt[s:s + block, None]
                top1_exact[s:s + block, si] = (pred[:, :1] == g).any(1)
                top1_near[s:s + block, si] = \
                    (np.abs(pred[:, :1] - g) <= 1).any(1)
                top3_exact[s:s + block, si] = (pred[:, :3] == g).any(1)
                top10_exact[s:s + block, si] = (pred[:, :10] == g).any(1)
                n_searches += len(ids_block)
                done = s + len(ids_block)
                ms = 1000.0 * (time.time() - t_start) / max(1, n_searches)
                table.update(si, [100.0 * m[:done, si].mean() for m in
                                  (top1_exact, top1_near, top3_exact,
                                   top10_exact)], done, n_test, ms)
            table.line_break()

    elapsed = time.time() - t_start
    ms_per_query = 1000.0 * elapsed / max(1, n_test * len(seq_lens))
    rates = np.stack([100.0 * top1_exact.mean(0), 100.0 * top1_near.mean(0),
                      100.0 * top3_exact.mean(0), 100.0 * top10_exact.mean(0)])
    print_results_table(seq_lens, rates, ms_per_query)

    np.save(os.path.join(emb_dir, "raw_score.npy"),
            np.concatenate([top1_exact, top1_near, top3_exact, top10_exact],
                           axis=1))
    np.save(os.path.join(emb_dir, "test_ids.npy"), ids)
    import json
    with open(os.path.join(emb_dir, "eval_summary.json"), "w") as f:
        json.dump({"index_type": index_type, "n_db": int(len(full_db)),
                   "n_test": int(n_test), "k_probe": int(k_probe),
                   "nprobe": (int(getattr(index, "nprobe", 0)) or None),
                   "seq_lens": [int(x) for x in seq_lens],
                   "build_sec": round(t_build, 1),
                   "search_sec": round(elapsed, 1),
                   "ms_per_query": round(ms_per_query, 3),
                   "rates": {name: [round(float(x), 2) for x in row]
                             for name, row in zip(
                                 ("top1_exact", "top1_near", "top3",
                                  "top10"), rates)}}, f, indent=1)
    print(f"Saved test_ids, raw score and eval_summary.json to {emb_dir}.")
    return rates
