"""Device-resident audio corpus: ship songs to HBM once, gather per step.

The host loader (``data/loader.py``) decodes and ships raw waveform
batches every step — O(batch x T) bytes over the host<->device link, the
same pattern as the reference's CPU tf.keras enqueuer feeding the GPU
(reference ``model/utils/dataloader_keras.py`` + ``trainer.py:183-194``).
On TPU the natural alternative for any corpus that fits HBM is to upload
the decoded songs ONCE as int16 PCM and slice segments on device: each
step then ships only int32 (song_row, start_frame) index pairs — O(batch)
bytes — and the per-step segment materialization rides HBM bandwidth
(~819 GB/s on v5e) instead of the link. Training throughput becomes
completely independent of host<->device bandwidth, which also makes
large-batch recipes drivable through slow links (measured 4.5 MB/s on
this development tunnel, where a bsz-640 host-loader step would ship
~30 MB ≈ 7 s of link time vs a 39 ms step).

Exactness: WAV PCM is int16 and both host decoders scale by 1/32768
(``native/wavio.cc:93``, ``data/audio_io.py:43``), so the device-side
``int16 * (1/32768)`` dequantization reproduces the host loader's float32
samples BIT-exactly (every i/32768 with |i| <= 32768 is representable in
float32). The wrapped loader's :meth:`~SegmentLoader.plan_batch` supplies
all offsets/shuffles/aug pairings, so the two paths consume one RNG
stream in one order and the produced batches are identical (tested,
``tests/test_device_corpus.py``).

Scope: one corpus per host process, replicated across the process's
addressable devices. On a multi-host pod each host holds its own shard of
the song list — implemented by ``parallel.mesh.process_shard`` in the
catalog's train/val loaders and exercised by the 2-process CPU run in
``tests/test_multihost.py`` — so the per-host HBM bound applies to the
host's shard, not the global corpus.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nafp_tpu.data.audio_io import load_wav_segment, wav_info
from nafp_tpu.data.loader import SegmentLoader
from nafp_tpu.native import load_segments_native
from nafp_tpu.ops.tdaug import MAX_IR_LENGTH
from nafp_tpu.utils.device import chunked_device_put

_PCM_SCALE = np.float32(1.0 / 32768.0)   # both host decoders' scale


def corpus_nbytes(paths: Sequence[str], pad_to: int = 128) -> int:
    """Estimated device bytes of a :class:`DeviceCorpus` over ``paths``
    (int16, every song padded to the longest); used to gate the resident
    path against an HBM budget before decoding anything."""
    if not paths:
        return 0
    longest = max(wav_info(p)[0] for p in paths)
    longest += (-longest) % pad_to
    return 2 * longest * len(paths)


class DeviceCorpus:
    """Decoded songs resident on device as one (n_songs, L) int16 array.

    ``L`` is the longest song rounded up to ``pad_to`` frames (min
    ``min_len``); shorter songs are zero-padded, matching the host
    loader's zero-padding of reads past EOF.
    """

    def __init__(self, paths: Sequence[str], fs: int = 8000,
                 decoder_threads: int = 4, pad_to: int = 128,
                 min_len: int = 0):
        assert paths, "empty corpus"
        self.paths = list(paths)
        self.row = {p: i for i, p in enumerate(self.paths)}
        self.fs = int(fs)
        longest = max(max(wav_info(p)[0] for p in self.paths), min_len)
        self.length = longest + (-longest) % pad_to
        n = len(self.paths)
        # int32 flat addressing in the gather kernel bounds the corpus at
        # 2**31 samples (~74 h of 8 kHz audio) — far above any single-host
        # HBM anyway (2**31 int16 = 4 GiB).
        assert n * self.length < 2 ** 31, "corpus exceeds 2**31 samples"
        pcm = np.zeros((n, self.length), np.int16)
        blk = 64
        for s in range(0, n, blk):
            e = min(s + blk, n)
            out = load_segments_native(self.paths[s:e], [0] * (e - s),
                                       self.length, decoder_threads)
            if out is None:
                out = np.stack([load_wav_segment(p, 0, self.length, fs)
                                for p in self.paths[s:e]])
            np.multiply(out, 32768.0, out=out)  # exact: values are i/32768
            pcm[s:e] = out                      # exact-integral f32 -> int16
        self.data = chunked_device_put(pcm)     # (n, L) int16

    def rows_of(self, paths: Sequence[str]) -> np.ndarray:
        return np.fromiter((self.row[p] for p in paths), np.int32,
                           count=len(paths))


@functools.partial(jax.jit, static_argnames=("seg_len",))
def gather_segments(corpus: jax.Array, rows: jax.Array, starts: jax.Array,
                    n_valid: jax.Array, *, seg_len: int) -> jax.Array:
    """(len(rows), seg_len) float32 segments sliced from the resident
    corpus; rows at index >= n_valid are zeroed (host-loader padding
    semantics). One fused XLA program: flat gather + dequant + mask."""
    L = corpus.shape[1]
    flat = corpus.reshape(-1)

    def one(r, s):
        return jax.lax.dynamic_slice(flat, (r * L + s,), (seg_len,))

    seg = jax.vmap(one)(rows, starts).astype(jnp.float32) * _PCM_SCALE
    mask = jnp.arange(rows.shape[0]) < n_valid
    return jnp.where(mask[:, None], seg, 0.0)


class DeviceGatherLoader:
    """Drop-in wrapper over a :class:`SegmentLoader` that returns batches
    gathered on device from resident corpora.

    ``__getitem__`` yields the same dict contract as the host loader
    ('anchors'/'replicas'/'bg'/'ir'/'speech' + host-side 'n_valid'), with
    waveform values as committed jax arrays. Every consumer that feeds
    batches into jitted code (trainer, generate, mini-search) works
    unchanged; attribute access falls through to the wrapped loader.
    """

    def __init__(self, base: SegmentLoader, decoder_threads: int = 4):
        self.base = base
        ev_paths = sorted({f for f, *_ in base.fns_event_seg_list})
        self._ev = DeviceCorpus(ev_paths, base.fs, decoder_threads,
                                min_len=base.seg_len)
        self._bg = (DeviceCorpus(sorted({f for f, *_ in base.bg_seg_list}),
                                 base.fs, decoder_threads,
                                 min_len=base.seg_len)
                    if base.bg_mix else None)
        self._ir = (DeviceCorpus(sorted({f for f, *_ in base.ir_seg_list}),
                                 base.fs, decoder_threads,
                                 min_len=MAX_IR_LENGTH)
                    if base.ir_mix else None)
        self._speech = (DeviceCorpus(
            sorted({f for f, *_ in base.speech_seg_list}),
            base.fs, decoder_threads, min_len=base.seg_len)
            if base.speech_mix else None)

    def __getattr__(self, name):
        return getattr(self.base, name)

    def __len__(self) -> int:
        return len(self.base)

    def _idx(self, corpus: DeviceCorpus, paths, starts, pad_rows: int):
        rows = np.zeros(pad_rows, np.int32)
        sts = np.zeros(pad_rows, np.int32)
        rows[:len(paths)] = corpus.rows_of(paths)
        sts[:len(starts)] = starts
        # A start past the row end would silently read into the NEXT song
        # (the gather is a flat slice); the planner's offset bounds keep
        # reads inside the padded row, so a violation is a bug — fail loud.
        if len(starts) and int(sts[:len(starts)].max()) + self._want_len(
                corpus) > corpus.length:
            raise ValueError("segment read past padded song end")
        return rows, sts

    def _want_len(self, corpus: DeviceCorpus) -> int:
        return MAX_IR_LENGTH if corpus is self._ir else self.base.seg_len

    def __getitem__(self, idx: int) -> Dict[str, object]:
        b = self.base
        plan = b.plan_batch(idx)
        n_valid = plan["n_valid"]
        out: Dict[str, object] = {"n_valid": np.int32(n_valid)}

        a_paths, a_starts = plan["anchors"]
        if b.reduce_batch_first_half:
            out["anchors"] = jnp.zeros((b.n_anchor, b.seg_len), jnp.float32)
        else:
            rows, sts = self._idx(self._ev, a_paths, a_starts, b.n_anchor)
            out["anchors"] = gather_segments(
                self._ev.data, jnp.asarray(rows), jnp.asarray(sts),
                jnp.int32(n_valid), seg_len=b.seg_len)

        p_paths, p_starts = plan["replicas"]
        if b.n_pos_bsz:
            rows, sts = self._idx(self._ev, p_paths, p_starts, b.n_pos_bsz)
            out["replicas"] = gather_segments(
                self._ev.data, jnp.asarray(rows), jnp.asarray(sts),
                jnp.int32(len(p_paths)), seg_len=b.seg_len)
        else:
            out["replicas"] = jnp.zeros((0, b.seg_len), jnp.float32)

        for key, corpus, seg_len in (("bg", self._bg, b.seg_len),
                                     ("ir", self._ir, MAX_IR_LENGTH),
                                     ("speech", self._speech, b.seg_len)):
            if corpus is None:
                continue
            paths, starts = plan[key]
            rows, sts = self._idx(corpus, paths, starts, b.n_pos_bsz)
            out[key] = gather_segments(
                corpus.data, jnp.asarray(rows), jnp.asarray(sts),
                jnp.int32(len(paths)), seg_len=seg_len)
        return out


def maybe_device_loader(loader: SegmentLoader, cfg: Dict,
                        decoder_threads: int = 4,
                        label: str = "") -> object:
    """Wrap ``loader`` in a :class:`DeviceGatherLoader` when
    ``DEVICE.DEVICE_CORPUS`` is on and the estimated corpus fits the
    ``DEVICE.DEVICE_CORPUS_MAX_GB`` budget (default 4 GiB); otherwise
    return the host loader unchanged (with a note, so a silently
    oversized corpus never downgrades throughput unexplained)."""
    dev_cfg = cfg.get("DEVICE", {})
    if not dev_cfg.get("DEVICE_CORPUS"):
        return loader
    budget = float(dev_cfg.get("DEVICE_CORPUS_MAX_GB", 4.0)) * 2 ** 30
    paths = {f for f, *_ in loader.fns_event_seg_list}
    est = corpus_nbytes(sorted(paths))
    if est > budget:
        print(f"[device_corpus] {label or 'corpus'} est {est / 2**30:.2f} "
              f"GiB exceeds DEVICE_CORPUS_MAX_GB — using the host loader",
              flush=True)
        return loader
    wrapped = DeviceGatherLoader(loader, decoder_threads)
    print(f"[device_corpus] {label or 'corpus'}: {len(paths)} songs "
          f"resident ({est / 2**30:.2f} GiB int16)", flush=True)
    return wrapped
