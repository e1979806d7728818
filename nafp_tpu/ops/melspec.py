"""Log-power mel-spectrogram frontend as pure JAX (MXU matmuls).

TPU-native re-design of the reference's kapre-based frontend
(``model/fp/melspec/melspectrogram.py:10-141``):

- framing by static gather + windowed real-DFT **as one matmul** against a
  precomputed ``(n_fft, 2*(n_fft//2+1))`` basis — lands on the MXU instead
  of an FFT op, and fuses with the mel filterbank matmul that follows;
- 'SAME'-style symmetric padding of ``n_fft//2`` per side, matching the
  reference's manual pad (``melspectrogram.py:59-65``) so 1 s @ 8 kHz /
  hop 256 yields exactly 32 frames;
- magnitude (not power) → mel filterbank (Slaney-norm, HTK=False — the
  librosa convention kapre 0.3.5 wraps) → ``+0.06`` offset → log10 →
  subtract global max → clip at −80 dB (``melspectrogram.py:102-112``);
- output layout ``(B, F, T, 1)`` = (batch, mel, frames, 1), the encoder's
  expected input (reference permute at ``melspectrogram.py:112``).

Everything here is shape-static and jit/vmap/pjit-friendly; the constants
(window, DFT basis, mel filterbank) are baked at trace time as numpy arrays
so XLA folds them into the compiled executable.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Mel filterbank (librosa/kapre convention: HTK=False, norm='slaney')
# ---------------------------------------------------------------------------
def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region,
                   min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz)
                   / logstep,
                   mel)
    return mel


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    log_region = m >= min_log_mel
    f = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


def mel_filterbank(fs: int, n_fft: int, n_mels: int,
                   f_min: float, f_max: float) -> np.ndarray:
    """Triangular mel filterbank, shape ``(n_fft//2 + 1, n_mels)``.

    Matches librosa.filters.mel(htk=False, norm='slaney'), which is what
    kapre 0.3.5's ApplyFilterbank('mel') uses in the reference
    (``melspectrogram.py:93-98``).
    """
    n_freq = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, fs / 2.0, n_freq)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max),
                                     n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: equal-area triangles.
    enorm = 2.0 / (mel_pts[2 + np.arange(n_mels)] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freq, n_mels)


# ---------------------------------------------------------------------------
# Windowed real-DFT basis
# ---------------------------------------------------------------------------
def dft_basis(n_fft: int) -> np.ndarray:
    """Hann-windowed real-DFT basis, shape ``(n_fft, 2*(n_fft//2+1))``.

    Columns are [cos_0..cos_K, -sin_0..-sin_K] so that
    ``frames @ basis`` yields [Re(X_k), Im(X_k)] per frame — identical to
    ``tf.signal.stft`` with a periodic Hann window (the kapre STFT backend,
    ``melspectrogram.py:81-89``).
    """
    n_freq = n_fft // 2 + 1
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    angle = -2.0 * np.pi * t * k / n_fft
    re = np.cos(angle) * window[:, None]
    im = np.sin(angle) * window[:, None]
    return np.concatenate([re, im], axis=1).astype(np.float32)


class MelSpecConfig(NamedTuple):
    fs: int = 8000
    dur: float = 1.0
    n_fft: int = 1024
    stft_hop: int = 256
    n_mels: int = 256
    f_min: float = 300.0
    f_max: float = 4000.0
    amin: float = 1e-10          # reference Melspec_layer amin (:36)
    dynamic_range: float = 80.0  # clip floor in dB (:37,:109)
    scale_offset: float = 0.06   # the '+0.06' quirk (:104)
    segment_norm: bool = False   # 'melspec_maxnorm' variant (:110-111)

    @property
    def n_samples(self) -> int:
        return int(self.fs * self.dur)

    @property
    def n_frames(self) -> int:
        padded = self.n_samples + 2 * (self.n_fft // 2)
        return 1 + (padded - self.n_fft) // self.stft_hop

    @classmethod
    def from_cfg(cls, cfg: Dict[str, Any]) -> "MelSpecConfig":
        m = cfg["MODEL"]
        return cls(fs=int(m["FS"]), dur=float(m["DUR"]),
                   n_fft=int(m["STFT_WIN"]), stft_hop=int(m["STFT_HOP"]),
                   n_mels=int(m["N_MELS"]), f_min=float(m["F_MIN"]),
                   f_max=float(m["F_MAX"]),
                   segment_norm=(m.get("FEAT", "melspec") == "melspec_maxnorm"))


@functools.lru_cache(maxsize=8)
def _constants(cfg: MelSpecConfig):
    basis = dft_basis(cfg.n_fft)                                   # (n_fft, 2K)
    mel_fb = mel_filterbank(cfg.fs, cfg.n_fft, cfg.n_mels,
                            cfg.f_min, cfg.f_max)                  # (K, n_mels)
    frame_idx = (np.arange(cfg.n_frames)[:, None] * cfg.stft_hop
                 + np.arange(cfg.n_fft)[None, :])                  # (T, n_fft)
    return basis, mel_fb, frame_idx.astype(np.int32)


def melspectrogram(x: jax.Array, cfg: MelSpecConfig,
                   axis_name=None) -> jax.Array:
    """Compute the log-power mel-spectrogram.

    Args:
      x: waveform batch, ``(B, T_samples)`` or ``(B, 1, T_samples)`` float32
         (the reference feeds ``(B, 1, T)``; both accepted).
      cfg: static MelSpecConfig.
      axis_name: mesh axis the batch is sharded over, if called inside
        shard_map. The reference's subtract-max runs over the WHOLE batch
        tensor (``tf.reduce_max(x)``, melspectrogram.py:107-109), so a
        sharded batch must pmax across devices to reproduce global-batch
        semantics; without it each shard normalizes by its local max.

    Returns:
      ``(B, n_mels, n_frames, 1)`` float32 log-mel features in [-80, 0].
    """
    if x.ndim == 3:
        x = x[:, 0, :]
    if x.shape[-1] != cfg.n_samples:
        # Guard explicitly: JAX gather clamps out-of-bounds indices, which
        # would otherwise silently mangle wrong-length inputs.
        raise ValueError(f"waveform length {x.shape[-1]} != expected "
                         f"{cfg.n_samples} (fs*dur)")
    basis, mel_fb, frame_idx = _constants(cfg)
    pad = cfg.n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    frames = xp[:, frame_idx]                           # (B, T, n_fft)
    B, T, _ = frames.shape
    # HIGH precision (3-pass bf16): default precision loses ~1.4e-2 in
    # log-mel through the log compression; HIGH is 3.9e-5 (measured vs
    # HIGHEST) and 19% faster end-to-end on v5e than HIGHEST's 6 passes.
    spec = jnp.einsum("btn,nk->btk", frames, jnp.asarray(basis),
                      precision=jax.lax.Precision.HIGH,
                      preferred_element_type=jnp.float32)
    n_freq = cfg.n_fft // 2 + 1
    re, im = spec[..., :n_freq], spec[..., n_freq:]
    mag = jnp.sqrt(re * re + im * im + 1e-30)           # |STFT|
    mel = jnp.einsum("btk,km->btm", mag, jnp.asarray(mel_fb),
                     precision=jax.lax.Precision.HIGH,
                     preferred_element_type=jnp.float32)

    # Reference post-processing chain (melspectrogram.py:102-112).
    mel = mel + cfg.scale_offset
    mel = jnp.log(jnp.maximum(mel, cfg.amin)) / np.log(10.0)
    mx = jnp.max(mel)                                   # global max over batch
    if axis_name is not None:
        mx = jax.lax.pmax(mx, axis_name)
    mel = mel - mx
    mel = jnp.maximum(mel, -cfg.dynamic_range)
    if cfg.segment_norm:
        mn = jnp.min(mel) / 2
        if axis_name is not None:
            mn = jax.lax.pmin(mn, axis_name)
        mel = (mel - mn) / jnp.abs(mn + 1e-10)
    return jnp.transpose(mel, (0, 2, 1))[..., None]     # (B, F, T, 1)


def get_melspec_fn(cfg: Dict[str, Any], variant: str = "default"):
    """Build a jittable ``x -> logmel`` closure from a framework config dict
    (counterpart of reference ``get_melspec_layer``, ``melspectrogram.py:115``).

    ``variant='lite'`` reproduces the mobile-export frontend's +0.1 scale
    offset (reference ``melspectrogram_tflite.py:88`` vs the main path's
    +0.06) — the only numerical difference between the two; there is no
    separate "TFLite op" needed here since the whole frontend is already
    plain XLA ops.
    """
    mcfg = MelSpecConfig.from_cfg(cfg)
    if variant == "lite":
        mcfg = mcfg._replace(scale_offset=0.1)
    elif variant != "default":
        raise ValueError(variant)
    return functools.partial(melspectrogram, cfg=mcfg), mcfg
