"""Device-resident corpus path == host loader path, bit-exactly.

The contract (data/device_corpus.py): plan_batch supplies identical
offsets/pairings to both paths, and int16 * (1/32768) dequantization on
device reproduces the host decoders' float32 samples exactly.
"""
import glob
import os
import wave

import numpy as np
import pytest

from nafp_tpu.data.device_corpus import (DeviceCorpus, DeviceGatherLoader,
                                         corpus_nbytes, maybe_device_loader)
from nafp_tpu.data.loader import SegmentLoader

FS = 8000


def _write_wav(path, seconds, f0=440.0, fs=FS):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = np.arange(int(fs * seconds)) / fs
    # Broadband-ish content so any off-by-one slice mismatch is visible.
    x = (0.4 * np.sin(2 * np.pi * f0 * t)
         + 0.3 * np.sin(2 * np.pi * 3.1 * f0 * t + 0.5))
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "w") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes(pcm.tobytes())
    return path


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("devcorpus"))
    for i in range(5):   # different lengths -> padded corpus rows
        _write_wav(f"{r}/music/{i:03d}.wav", 4.0 + 0.7 * i, 250 + 80 * i)
    for i in range(2):
        _write_wav(f"{r}/bg/{i}.wav", 3.0, 60 + 15 * i)
        _write_wav(f"{r}/ir/{i}.wav", 0.05, 1200)  # 400 frames < 600 pad
        _write_wav(f"{r}/speech/{i}.wav", 2.0, 120 + 30 * i)
    return r


def _batches_equal(host_b, dev_b):
    assert set(host_b) == set(dev_b)
    assert int(host_b["n_valid"]) == int(dev_b["n_valid"])
    for k in host_b:
        if k == "n_valid":
            continue
        np.testing.assert_array_equal(
            np.asarray(dev_b[k]), host_b[k],
            err_msg=f"key {k} differs between host and device loaders")


def _loader_pair(root, **kw):
    host = SegmentLoader(**kw)
    dev = DeviceGatherLoader(SegmentLoader(**kw))
    return host, dev


def test_train_loader_bit_exact(root):
    fps = sorted(glob.glob(root + "/music/*.wav"))
    kw = dict(fns_event_list=fps, bsz=8, n_anchor=4, duration=1.0, hop=0.5,
              fs=FS, shuffle=True, random_offset_anchor=True,
              bg_fps=sorted(glob.glob(root + "/bg/*.wav")),
              ir_fps=sorted(glob.glob(root + "/ir/*.wav")),
              speech_fps=sorted(glob.glob(root + "/speech/*.wav")))
    host, dev = _loader_pair(root, **kw)
    assert len(host) == len(dev)
    for i in (0, 1, len(host) - 1):
        _batches_equal(host[i], dev[i])
    # epoch reshuffles stay in lockstep
    host.set_epoch(3)
    dev.set_epoch(3)
    _batches_equal(host[0], dev[0])


def test_db_loader_short_last_batch(root):
    fps = sorted(glob.glob(root + "/music/*.wav"))
    kw = dict(fns_event_list=fps, bsz=16, n_anchor=16, duration=1.0,
              hop=0.5, fs=FS, drop_the_last_non_full_batch=False)
    host, dev = _loader_pair(root, **kw)
    last = len(host) - 1
    hb, db = host[last], dev[last]
    assert int(hb["n_valid"]) < 16    # actually exercises the padding mask
    _batches_equal(hb, db)


def test_query_synth_loader(root):
    # reduce_batch_first_half: anchors dropped (zeros), replicas gathered
    fps = sorted(glob.glob(root + "/music/*.wav"))
    kw = dict(fns_event_list=fps, bsz=8, n_anchor=4, duration=1.0, hop=0.5,
              fs=FS, reduce_batch_first_half=True, experimental_mode=True)
    host, dev = _loader_pair(root, **kw)
    _batches_equal(host[0], dev[0])


def test_corpus_rows_padded_and_exact(root):
    fps = sorted(glob.glob(root + "/music/*.wav"))
    c = DeviceCorpus(fps, FS)
    from nafp_tpu.data.audio_io import load_wav_segment, wav_info
    n0, _ = wav_info(fps[0])
    row = np.asarray(c.data[c.row[fps[0]]]).astype(np.float32) / 32768.0
    np.testing.assert_array_equal(row[:n0],
                                  load_wav_segment(fps[0], 0, n0, FS))
    assert (row[n0:] == 0).all()
    assert corpus_nbytes(fps) == c.data.shape[0] * c.data.shape[1] * 2


def test_maybe_device_loader_gates(root):
    fps = sorted(glob.glob(root + "/music/*.wav"))
    ld = SegmentLoader(fns_event_list=fps, bsz=4, n_anchor=4, duration=1.0,
                       hop=0.5, fs=FS)
    off = {"DEVICE": {}}
    assert maybe_device_loader(ld, off) is ld
    tiny_budget = {"DEVICE": {"DEVICE_CORPUS": True,
                              "DEVICE_CORPUS_MAX_GB": 1e-9}}
    assert maybe_device_loader(ld, tiny_budget) is ld
    on = {"DEVICE": {"DEVICE_CORPUS": True}}
    wrapped = maybe_device_loader(ld, on)
    assert isinstance(wrapped, DeviceGatherLoader)
    # attribute passthrough the trainer relies on
    assert wrapped.bsz == 4 and wrapped.bg_mix is False
    _batches_equal(ld[0], wrapped[0])
