"""Native wavio decoder: build, parity with the Python decoder, throughput."""
import os
import time
import wave

import numpy as np
import pytest

from nafp_tpu.data.audio_io import load_wav_segment, wav_info
from nafp_tpu.native import load_segments_native, wav_info_native, wavio_lib


def _wav(path, sec=2.0, f0=440.0, fs=8000):
    t = np.arange(int(fs * sec)) / fs
    r = np.random.default_rng(abs(hash(path)) % 2**31)
    x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.1 * r.standard_normal(len(t))
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "w") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes(pcm.tobytes())
    return path


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    return [_wav(str(d / f"{i}.wav"), 2.0, 200 + 40 * i) for i in range(8)]


def test_native_builds():
    assert wavio_lib() is not None, "g++ build of wavio.cc must succeed here"


def test_native_matches_python(wavs):
    paths = [wavs[i % len(wavs)] for i in range(20)]
    starts = [i * 321 for i in range(20)]
    native = load_segments_native(paths, starts, 8000)
    assert native is not None
    for i, (p, s) in enumerate(zip(paths, starts)):
        ref = load_wav_segment(p, s, 8000)
        np.testing.assert_allclose(native[i], ref, atol=1e-7,
                                   err_msg=f"{p}@{s}")


def test_native_tail_padding(wavs):
    # start past the data: all zeros; start partially past: padded tail
    out = load_segments_native([wavs[0], wavs[0]], [100000, 15000], 8000)
    assert (out[0] == 0).all()
    assert (out[1][:1000] != 0).any() and (out[1][1000:] == 0).all()


def test_native_wav_info(wavs):
    got = wav_info_native(wavs[0])
    assert got == wav_info(wavs[0]) == (16000, 8000)


def test_native_bad_file_raises(tmp_path):
    bad = str(tmp_path / "bad.wav")
    open(bad, "wb").write(b"not a wav file at all........")
    with pytest.raises(IOError):
        load_segments_native([bad], [0], 100)


def test_loader_native_vs_python_identical(wavs):
    from nafp_tpu.data.loader import SegmentLoader
    kw = dict(bsz=8, n_anchor=4, fs=8000, shuffle=True,
              random_offset_anchor=True, bg_fps=wavs[:2], ir_fps=wavs[2:3])
    a = SegmentLoader(wavs, use_native_decoder=True, **kw)[0]
    b = SegmentLoader(wavs, use_native_decoder=False, **kw)[0]
    for k in ("anchors", "replicas", "bg", "ir"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-7, err_msg=k)


def test_native_faster_than_python(wavs):
    paths = [wavs[i % len(wavs)] for i in range(256)]
    starts = [(i * 97) % 8000 for i in range(256)]
    # best-of-3 each: a loaded single-core box makes one-shot wall times
    # flaky (thread scheduling), and this is a smoke check, not a bench
    t_native, t_py = 1e9, 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        load_segments_native(paths, starts, 8000, n_threads=4)
        t_native = min(t_native, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for p, s in zip(paths, starts):
            load_wav_segment(p, s, 8000)
        t_py = min(t_py, time.perf_counter() - t0)
    print(f"native {t_native*1e3:.1f}ms vs python {t_py*1e3:.1f}ms")
    assert t_native < t_py * 1.2  # should be faster; 20% scheduling slack
