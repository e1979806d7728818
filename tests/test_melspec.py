"""Golden tests for the log-mel frontend.

The windowed-DFT matmul is validated against an independent np.fft path, and
the mel filterbank against scale-invariants of the Slaney convention (the
one kapre 0.3.5 wraps; reference melspectrogram.py:93-98).
"""
import jax
import jax.numpy as jnp
import numpy as np

from nafp_tpu.ops.melspec import (MelSpecConfig, _hz_to_mel, _mel_to_hz,
                                  dft_basis, mel_filterbank, melspectrogram)

CFG = MelSpecConfig()  # 8 kHz, 1 s, n_fft 1024, hop 256, 256 mels, 300-4000 Hz


def _np_reference_logmel(x: np.ndarray, cfg: MelSpecConfig) -> np.ndarray:
    """Independent numpy reference: np.fft.rfft framing path."""
    pad = cfg.n_fft // 2
    xp = np.pad(x, ((0, 0), (pad, pad)))
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(cfg.n_fft) / cfg.n_fft)
    frames = np.stack([
        xp[:, i * cfg.stft_hop:i * cfg.stft_hop + cfg.n_fft] * win
        for i in range(cfg.n_frames)], axis=1)
    mag = np.abs(np.fft.rfft(frames, axis=-1))
    fb = mel_filterbank(cfg.fs, cfg.n_fft, cfg.n_mels, cfg.f_min, cfg.f_max)
    mel = mag @ fb + cfg.scale_offset
    mel = np.log(np.maximum(mel, cfg.amin)) / np.log(10.0)
    mel = mel - mel.max()
    mel = np.maximum(mel, -cfg.dynamic_range)
    return np.transpose(mel, (0, 2, 1))[..., None]


def test_frame_count_is_32():
    # 1 s @ 8 kHz with symmetric n_fft//2 pad and hop 256 -> 32 frames
    # (the encoder's expected T; reference nnfp.py:248 input (256, 32, 1)).
    assert CFG.n_frames == 32


def test_matches_numpy_fft_path(rng):
    x = rng.standard_normal((3, 8000)).astype(np.float32) * 0.3
    got = np.asarray(melspectrogram(jnp.asarray(x), CFG))
    want = _np_reference_logmel(x, CFG)
    assert got.shape == (3, 256, 32, 1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_pure_tone_peaks_at_expected_mel_bin(rng):
    # A 1 kHz tone must peak at the mel bin whose center frequency is
    # nearest 1 kHz.
    f0 = 1000.0
    t = np.arange(8000) / 8000.0
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)[None, :]
    out = np.asarray(melspectrogram(jnp.asarray(x), CFG))[0, :, 16, 0]
    centers = _mel_to_hz(np.linspace(_hz_to_mel(CFG.f_min),
                                     _hz_to_mel(CFG.f_max), CFG.n_mels + 2))[1:-1]
    assert abs(centers[np.argmax(out)] - f0) < 30.0


def test_mel_scale_roundtrip():
    f = np.array([300.0, 999.0, 1000.0, 2345.0, 4000.0])
    np.testing.assert_allclose(_mel_to_hz(_hz_to_mel(f)), f, rtol=1e-10)


def test_filterbank_shape_and_slaney_area():
    fb = mel_filterbank(8000, 1024, 256, 300.0, 4000.0)
    assert fb.shape == (513, 256)
    assert fb.min() >= 0.0
    # Slaney norm: filter area in Hz ~ 1 after equal-area scaling
    # (area = sum(weights) * bin_width ~ 1 for interior filters).
    bin_hz = 8000 / 2 / 512
    areas = fb.sum(axis=0) * bin_hz
    interior = areas[5:-5]
    np.testing.assert_allclose(interior, np.ones_like(interior), atol=0.25)


def test_output_range_and_dtype(rng):
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    out = np.asarray(melspectrogram(jnp.asarray(x), CFG))
    assert out.dtype == np.float32
    assert out.max() <= 1e-5 and out.min() >= -80.0


def test_dft_basis_orthogonality():
    # Parseval-ish check: energy through the basis equals windowed energy.
    basis = dft_basis(64)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(64) / 64)
    x = np.random.default_rng(1).standard_normal(64).astype(np.float32)
    spec = x @ basis
    n_freq = 33
    re, im = spec[:n_freq], spec[n_freq:]
    # rfft energy with hermitian double-count correction
    e_spec = (re**2 + im**2)
    e_spec = e_spec[0] + 2 * e_spec[1:-1].sum() + e_spec[-1]
    e_time = ((x * win) ** 2).sum() * 64
    np.testing.assert_allclose(e_spec, e_time, rtol=1e-4)


def test_accepts_channel_dim(rng):
    x = rng.standard_normal((2, 1, 8000)).astype(np.float32)
    out = melspectrogram(jnp.asarray(x), CFG)
    assert out.shape == (2, 256, 32, 1)


def test_jit_and_vmap_composable(rng):
    x = jnp.asarray(rng.standard_normal((4, 8000)).astype(np.float32))
    f = jax.jit(lambda a: melspectrogram(a, CFG))
    np.testing.assert_allclose(np.asarray(f(x)),
                               np.asarray(melspectrogram(x, CFG)),
                               atol=1e-5)
