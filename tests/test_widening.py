"""Tests for the widening pass: speech aug, lite mel variant, plotter,
device stats, experimental offsets."""
import os
import wave

import jax
import jax.numpy as jnp
import numpy as np

from nafp_tpu.configuration import load_config
from nafp_tpu.ops.melspec import get_melspec_fn
from nafp_tpu.ops.tdaug import augment_replicas


def test_lite_melspec_variant_offset(rng):
    cfg = load_config("default")
    mel_d, c_d = get_melspec_fn(cfg)
    mel_l, c_l = get_melspec_fn(cfg, variant="lite")
    assert c_d.scale_offset == 0.06 and c_l.scale_offset == 0.1
    x = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
    a, b = np.asarray(mel_d(x)), np.asarray(mel_l(x))
    assert not np.allclose(a, b)


def test_speech_plus_bg_sum_semantics(rng):
    x = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
    bg = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
    sp = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    both = augment_replicas(x, bg, None, k, use_bg=True, use_ir=False,
                            speech=sp, use_speech=True)
    summed = augment_replicas(x, bg + sp, None, k, use_bg=True, use_ir=False)
    np.testing.assert_array_equal(np.asarray(both), np.asarray(summed))
    only_speech = augment_replicas(x, None, None, k, use_bg=False,
                                   use_ir=False, speech=sp, use_speech=True)
    assert np.isfinite(np.asarray(only_speech)).all()


def test_loader_speech_source(tmp_path):
    def wav(p, sec, f0):
        os.makedirs(os.path.dirname(p), exist_ok=True)
        t = np.arange(int(8000 * sec)) / 8000
        pcm = (0.4 * np.sin(2 * np.pi * f0 * t) * 32767).astype(np.int16)
        with wave.open(p, "w") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(pcm.tobytes())
        return p

    from nafp_tpu.data.loader import SegmentLoader
    songs = [wav(str(tmp_path / f"m{i}.wav"), 4.0, 300 + i * 50)
             for i in range(2)]
    speech = [wav(str(tmp_path / "s0.wav"), 3.0, 120)]
    ld = SegmentLoader(songs, bsz=4, n_anchor=2, fs=8000,
                       speech_fps=speech)
    b = ld[0]
    assert b["speech"].shape == (2, 8000)
    assert np.abs(b["speech"]).max() > 0


def test_experimental_mode_offsets_deterministic(tmp_path):
    def wav(p, sec, f0):
        t = np.arange(int(8000 * sec)) / 8000
        pcm = (0.4 * np.sin(2 * np.pi * f0 * t) * 32767).astype(np.int16)
        with wave.open(p, "w") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(pcm.tobytes())
        return p

    from nafp_tpu.data.loader import SegmentLoader
    p = wav(str(tmp_path / "a.wav"), 4.0, 440)
    ld1 = SegmentLoader([p], bsz=4, n_anchor=2, fs=8000,
                        experimental_mode=True,
                        drop_the_last_non_full_batch=False)
    ld2 = SegmentLoader([p], bsz=4, n_anchor=2, fs=8000,
                        experimental_mode=True,
                        drop_the_last_non_full_batch=False)
    np.testing.assert_array_equal(ld1[0]["replicas"], ld2[0]["replicas"])


def test_plotter_renders_image():
    from nafp_tpu.utils.plotter import get_imshow_image
    img = get_imshow_image(np.random.default_rng(0).random((16, 16)),
                           title="sim")
    assert img.ndim == 3 and img.shape[2] == 4 and img.dtype == np.uint8


def test_device_stats():
    from nafp_tpu.utils.device import device_memory_stats
    stats = device_memory_stats()
    assert len(stats) == 8  # test mesh
    assert all(s["platform"] == "cpu" for s in stats)
