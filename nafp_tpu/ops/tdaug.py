"""Time-domain augmentation on-device: SNR background mix + IR reverb.

The reference does this per-sample in numpy worker processes
(``model/utils/audio_utils.py:28-137`` driven from
``dataloader_keras.py:223-311``) — its known throughput bottleneck, and the
author's own stated blocker for TPU training (``NTxent_loss_tpu.py:19-24``).
Here the host loader only *reads* raw waveforms; all mixing math runs
batched inside the jitted train step:

- ``bg_mix_batch``: per-sample SNR ~ U[min,max] dB, RMS-normalize signal and
  noise, mix ``10^(snr/20) * x + bg``, max-normalize, then scale by a
  log-uniform amplitude in [0.1, 1] (``audio_utils.py:28-114``; zero-energy
  fallbacks preserved).
- ``ir_aug_batch``: FFT -> multiply -> IFFT convolution with the impulse
  response truncated to 600 samples (75 ms @ 8 kHz;
  ``dataloader_keras.py:8,472-473``), max-normalized
  (``audio_utils.py:117-137``).

Both are pure functions of a PRNG key — reproducible, vmappable, and fused
by XLA into the melspec/encoder step.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

MAX_IR_LENGTH = 600  # samples; reference dataloader_keras.py:8


def _max_normalize(x: jax.Array) -> jax.Array:
    """Per-row max-normalize; zero rows pass through (audio_utils.py:10-25)."""
    m = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return jnp.where(m > 0, x / jnp.where(m > 0, m, 1.0), x)


def bg_mix_batch(x: jax.Array,
                 bg: jax.Array,
                 key: jax.Array,
                 snr_range: Tuple[float, float] = (0.0, 10.0),
                 amp_range: Tuple[float, float] = (0.1, 1.0)) -> jax.Array:
    """Mix each row of ``x`` (B, T) with ``bg`` (B, T) at a random SNR.

    Follows ``bg_mix_batch``/``background_mix`` (audio_utils.py:80-114,
    :28-70): RMS-normalized mix at snr dB, max-normalize, log-uniform
    amplitude scale.
    """
    b, t = x.shape
    k_snr, k_amp = jax.random.split(key)
    snr = jax.random.uniform(k_snr, (b, 1), minval=min(snr_range),
                             maxval=max(snr_range))
    log_lo, log_hi = jnp.log10(amp_range[0]), jnp.log10(amp_range[1])
    amp = 10.0 ** jax.random.uniform(k_amp, (b, 1), minval=log_lo,
                                     maxval=log_hi)

    rms_x = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True) / t)
    rms_bg = jnp.sqrt(jnp.sum(bg ** 2, axis=-1, keepdims=True) / t)
    x_n = x / jnp.where(rms_x > 0, rms_x, 1.0)
    bg_n = bg / jnp.where(rms_bg > 0, rms_bg, 1.0)
    mixed = 10.0 ** (snr / 20.0) * x_n + bg_n

    # Zero-energy fallback: plain sum (audio_utils.py:103-105).
    max_x = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    max_bg = jnp.max(jnp.abs(bg), axis=-1, keepdims=True)
    degenerate = (max_x == 0) | (max_bg == 0)
    mixed = jnp.where(degenerate, x + bg, mixed)
    return amp * _max_normalize(mixed)


def ir_aug_batch(x: jax.Array, ir: jax.Array) -> jax.Array:
    """Convolve each row of ``x`` (B, T) with its impulse response (B, L).

    FFT-multiply-IFFT with L <= MAX_IR_LENGTH, output truncated to T and
    max-normalized (audio_utils.py:117-137).
    """
    b, t = x.shape
    if ir.shape[-1] > MAX_IR_LENGTH:
        ir = ir[:, :MAX_IR_LENGTH]
    n = max(t, ir.shape[-1])
    X = jnp.fft.rfft(x, n=n, axis=-1)
    H = jnp.fft.rfft(ir, n=n, axis=-1)
    y = jnp.fft.irfft(X * H, n=n, axis=-1)[:, :t]
    return _max_normalize(y).astype(x.dtype)


def augment_replicas(xp: jax.Array,
                     bg: jax.Array,
                     ir: jax.Array,
                     key: jax.Array,
                     snr_range: Tuple[float, float] = (0.0, 10.0),
                     use_bg: bool = True,
                     use_ir: bool = True,
                     speech: jax.Array = None,
                     use_speech: bool = False) -> jax.Array:
    """Full replica-side time-domain chain: noise mix then IR reverb.

    Matches the order and combination logic of
    ``genUnbalSequence.__getitem__`` (dataloader_keras.py:231-301): with
    both bg and speech enabled the noises are *summed* and mixed once
    (:248-253); with only one enabled it is mixed alone; anchors are never
    augmented.
    """
    use_bg = use_bg and bg is not None
    use_speech = use_speech and speech is not None
    if use_bg and use_speech:
        xp = bg_mix_batch(xp, bg + speech, key, snr_range)
    elif use_bg:
        xp = bg_mix_batch(xp, bg, key, snr_range)
    elif use_speech:
        xp = bg_mix_batch(xp, speech, key, snr_range)
    if use_ir and ir is not None:
        xp = ir_aug_batch(xp, ir)
    return xp
