"""Augmentation op tests: mask geometry, fillers, SNR math, IR convolution."""
import jax
import jax.numpy as jnp
import numpy as np

from nafp_tpu.ops.specaug import spec_augment
from nafp_tpu.ops.tdaug import bg_mix_batch, ir_aug_batch, augment_replicas

KEY = jax.random.PRNGKey(7)


def _spec(b=4, f=64, t=32):
    return jnp.ones((b, f, t, 1), jnp.float32)


def test_cutout_zeros_creates_rect_holes():
    out = np.asarray(spec_augment(_spec(), KEY, chain=("cutout",),
                                  n_holes=2, hole_fill="zeros",
                                  uniform_mask=False))
    # some pixels zeroed, a minority of the area
    frac = (out == 0).mean()
    assert 0.0 < frac < 0.6
    # holes are per-sample: masks differ across batch
    masks = (out == 0)[..., 0]
    assert not all(np.array_equal(masks[0], masks[i]) for i in range(1, 4))


def test_uniform_mask_shares_hole_across_batch():
    out = np.asarray(spec_augment(_spec(), KEY, chain=("cutout",),
                                  probs=1.0, n_holes=1, hole_fill="zeros",
                                  uniform_mask=True))
    masks = (out == 0)[..., 0]
    assert all(np.array_equal(masks[0], masks[i]) for i in range(1, 4))


def test_vertical_stripe_spans_full_freq():
    out = np.asarray(spec_augment(_spec(), KEY, chain=("vertical",),
                                  hole_fill="zeros", uniform_mask=False))
    holes = (out == 0)[..., 0]  # (B,F,T)
    for b in range(holes.shape[0]):
        cols = holes[b].any(axis=0)
        assert cols.any()
        # every holed column covers all freq bins
        assert (holes[b][:, cols].all(axis=0)).all()
        # stripe width within [2, 16] (size 5..15, clipped center math)
        assert 2 <= cols.sum() <= 16


def test_horizontal_stripe_spans_full_time():
    out = np.asarray(spec_augment(_spec(), KEY, chain=("horizontal",),
                                  hole_fill="zeros", uniform_mask=False))
    holes = (out == 0)[..., 0]
    for b in range(holes.shape[0]):
        rows = holes[b].any(axis=1)
        assert rows.any()
        assert (holes[b][rows, :].all(axis=1)).all()


def test_prob_zero_is_identity():
    x = _spec()
    out = spec_augment(x, KEY, chain=("cutout", "horizontal"), probs=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_hole_fill_range():
    out = np.asarray(spec_augment(_spec() * 5.0, KEY, chain=("cutout",),
                                  hole_fill=(-3.0, -2.0),
                                  uniform_mask=False))
    holed = out[out != 5.0]
    assert holed.size > 0
    assert ((holed >= -3.0) & (holed <= -2.0)).all()


def test_chain_order_applies_both():
    out = np.asarray(spec_augment(_spec(), KEY,
                                  chain=("cutout", "horizontal"),
                                  hole_fill="zeros", uniform_mask=False))
    assert (out == 0).any()


def test_bg_mix_snr_and_amp(rng):
    t = 8000
    x = jnp.asarray(rng.standard_normal((8, t)).astype(np.float32))
    bg = jnp.asarray(rng.standard_normal((8, t)).astype(np.float32))
    out = np.asarray(bg_mix_batch(x, bg, KEY, snr_range=(0.0, 10.0)))
    # max-normalized then amp-scaled into [0.1, 1]
    peaks = np.abs(out).max(axis=1)
    assert ((peaks >= 0.1 - 1e-5) & (peaks <= 1.0 + 1e-5)).all()


def test_bg_mix_zero_noise_fallback(rng):
    x = jnp.asarray(rng.standard_normal((2, 100)).astype(np.float32))
    bg = jnp.zeros((2, 100), jnp.float32)
    out = np.asarray(bg_mix_batch(x, bg, KEY))
    # degenerate path: amp * max_normalize(x + 0) is proportional to x
    xn = np.asarray(x)
    for i in range(2):
        j = np.abs(xn[i]).argmax()
        c = out[i, j] / xn[i, j]
        np.testing.assert_allclose(out[i], c * xn[i], atol=1e-5)


def test_ir_aug_matches_numpy_fft(rng):
    t, l = 8000, 600
    x = rng.standard_normal((3, t)).astype(np.float32)
    ir = rng.standard_normal((3, l)).astype(np.float32) * np.exp(
        -np.arange(l) / 50)[None, :].astype(np.float32)
    got = np.asarray(ir_aug_batch(jnp.asarray(x), jnp.asarray(ir)))
    # reference numpy transcription (audio_utils.py:117-137)
    want = np.zeros_like(x)
    for i in range(3):
        n = max(t, l)
        y = np.fft.ifft(np.fft.fft(x[i], n) * np.fft.fft(ir[i], n))[:t].real
        want[i] = y / np.abs(y).max()
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_ir_identity_impulse(rng):
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    ir = np.zeros((2, 600), np.float32)
    ir[:, 0] = 1.0  # delta -> output is max-normalized input
    got = np.asarray(ir_aug_batch(jnp.asarray(x), jnp.asarray(ir)))
    want = x / np.abs(x).max(axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ir_truncated_to_600(rng):
    x = jnp.asarray(rng.standard_normal((1, 1000)).astype(np.float32))
    ir_long = np.zeros((1, 2000), np.float32)
    ir_long[0, 0] = 1.0
    ir_long[0, 1500] = 100.0  # past the 600-sample cut: must be ignored
    ir_short = ir_long[:, :600]
    got_long = np.asarray(ir_aug_batch(x, jnp.asarray(ir_long)))
    got_short = np.asarray(ir_aug_batch(x, jnp.asarray(ir_short)))
    np.testing.assert_allclose(got_long, got_short, atol=1e-6)


def test_augment_replicas_composes(rng):
    x = jnp.asarray(rng.standard_normal((4, 8000)).astype(np.float32))
    bg = jnp.asarray(rng.standard_normal((4, 8000)).astype(np.float32))
    ir = jnp.asarray(rng.standard_normal((4, 600)).astype(np.float32))
    out = augment_replicas(x, bg, ir, KEY)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # deterministic under the same key
    out2 = augment_replicas(x, bg, ir, KEY)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
