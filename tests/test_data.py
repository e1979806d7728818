"""Data pipeline tests on synthetic WAV fixtures."""
import os
import wave

import numpy as np
import pytest

from nafp_tpu.data.audio_io import (create_memmap, load_memmap,
                                    load_wav_segment, wav_info)
from nafp_tpu.data.catalog import Dataset, build_seg_list
from nafp_tpu.data.loader import SegmentLoader, prefetch

FS = 8000


def _write_wav(path, seconds, f0=440.0, fs=FS):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = np.arange(int(fs * seconds)) / fs
    x = (0.5 * np.sin(2 * np.pi * f0 * t) * 32767).astype(np.int16)
    with wave.open(path, "w") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes(x.tobytes())
    return path


@pytest.fixture(scope="module")
def wav_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wavs"))
    for i in range(4):
        _write_wav(f"{root}/music/train-10k-30s/{i:03d}.wav", 10.0,
                   300 + 100 * i)
        _write_wav(f"{root}/music/val-query-db-500-30s/{i:03d}.wav", 10.0,
                   350 + 100 * i)
    for i in range(2):
        _write_wav(f"{root}/aug/bg/tr/{i}.wav", 5.0, 60 + 10 * i)
        _write_wav(f"{root}/aug/ir/tr/{i}.wav", 0.2, 1000)
    return root


def test_wav_roundtrip(tmp_path):
    p = _write_wav(str(tmp_path / "a.wav"), 1.0)
    n, fs = wav_info(p)
    assert (n, fs) == (8000, FS)
    x = load_wav_segment(p, 0, 8000, FS)
    assert x.shape == (8000,)
    assert abs(x).max() > 0.4


def test_wav_segment_tail_padding(tmp_path):
    p = _write_wav(str(tmp_path / "b.wav"), 1.0)
    x = load_wav_segment(p, 7000, 8000, FS)  # 1000 real + 7000 pad
    assert (x[1000:] == 0).all() and (x[:1000] != 0).any()


def test_seg_list_semantics(tmp_path):
    # 10 s at dur 1 / hop .5 -> 19 segments; offsets bounded at edges.
    p = _write_wav(str(tmp_path / "c.wav"), 10.0)
    segs = build_seg_list([p], "all", FS, 1.0, 0.5)
    assert len(segs) == 19
    assert segs[0][2] == 0                     # first: no negative offset
    assert segs[1][2] == -4000 and segs[1][3] == 4000
    assert segs[-1][3] == 0                    # exact fit: residual 0
    segs_first = build_seg_list([p], "first", FS, 1.0)
    assert segs_first == [(p, 0, 0, 0)]


def test_train_loader_shapes(wav_root):
    fps = sorted(__import__("glob").glob(wav_root + "/music/train-10k-30s/*.wav"))
    bg = sorted(__import__("glob").glob(wav_root + "/aug/bg/tr/*.wav"))
    ir = sorted(__import__("glob").glob(wav_root + "/aug/ir/tr/*.wav"))
    ld = SegmentLoader(fps, bsz=8, n_anchor=4, duration=1.0, hop=0.5, fs=FS,
                       shuffle=True, random_offset_anchor=True,
                       bg_fps=bg, ir_fps=ir)
    assert len(ld) == (4 * 19) // 4
    b = ld[0]
    assert b["anchors"].shape == (4, 8000)
    assert b["replicas"].shape == (4, 8000)
    assert b["bg"].shape == (4, 8000)
    assert b["ir"].shape == (4, 600)
    assert int(b["n_valid"]) == 4
    # replicas are clean (same song, overlapping content): nonzero
    assert np.abs(b["replicas"]).max() > 0
    # epoch reshuffle changes batch composition
    a0 = b["anchors"].copy()
    ld.set_epoch(1)
    assert not np.allclose(ld[0]["anchors"], a0)
    # ...but the same epoch is reproducible
    ld.set_epoch(0)
    np.testing.assert_array_equal(ld[0]["anchors"], a0)


def test_db_loader_no_aug_and_padding(wav_root):
    fps = sorted(__import__("glob").glob(wav_root + "/music/train-10k-30s/*.wav"))
    ld = SegmentLoader(fps, bsz=50, n_anchor=50, duration=1.0, hop=0.5, fs=FS,
                       drop_the_last_non_full_batch=False)
    assert ld.n_samples == 76  # 4 songs x 19 segs
    assert len(ld) == 2
    last = ld[1]
    assert int(last["n_valid"]) == 26
    assert (last["anchors"][26:] == 0).all()
    assert "bg" not in last and "ir" not in last


def test_dataset_facade(wav_root):
    from nafp_tpu.configuration import load_config
    cfg = load_config("default")
    cfg["DIR"]["SOURCE_ROOT_DIR"] = wav_root + "/music/"
    cfg["DIR"]["BG_ROOT_DIR"] = wav_root + "/aug/bg/"
    cfg["DIR"]["IR_ROOT_DIR"] = wav_root + "/aug/ir/"
    cfg["BSZ"]["TR_BATCH_SZ"], cfg["BSZ"]["TR_N_ANCHOR"] = 8, 4
    cfg["BSZ"]["VAL_BATCH_SZ"], cfg["BSZ"]["VAL_N_ANCHOR"] = 8, 4
    ds = Dataset(cfg)
    tr = ds.get_train_ds()
    assert len(tr) > 0 and tr.bg_mix and tr.ir_mix
    val = ds.get_val_ds(max_song=2)
    assert val.shuffle is False
    b = val[0]
    assert b["anchors"].shape == (4, 8000)


def test_prefetch_order(wav_root):
    fps = sorted(__import__("glob").glob(wav_root + "/music/train-10k-30s/*.wav"))
    ld = SegmentLoader(fps, bsz=4, n_anchor=4, duration=1.0, hop=0.5, fs=FS,
                       drop_the_last_non_full_batch=False)
    direct = [ld[i]["anchors"] for i in range(len(ld))]
    fetched = [b["anchors"] for b in prefetch(ld)]
    assert len(direct) == len(fetched)
    for d, f in zip(direct, fetched):
        np.testing.assert_array_equal(d, f)


def test_memmap_roundtrip(tmp_path):
    arr = create_memmap(str(tmp_path), "db", (10, 128))
    arr[:] = np.arange(1280).reshape(10, 128)
    arr.flush()
    data, shape = load_memmap(str(tmp_path), "db", display=False)
    assert shape == (10, 128)
    np.testing.assert_array_equal(np.asarray(data), arr)
    assert load_memmap(str(tmp_path), "db", shape_only=True) == (10, 128)


def test_song_cache_identical_to_direct(wav_root):
    from nafp_tpu.data.loader import SegmentLoader
    fps = sorted(__import__("glob").glob(wav_root + "/music/train-10k-30s/*.wav"))
    bg = sorted(__import__("glob").glob(wav_root + "/aug/bg/tr/*.wav"))
    kw = dict(bsz=8, n_anchor=4, duration=1.0, hop=0.5, fs=FS, shuffle=True,
              random_offset_anchor=True, bg_fps=bg)
    cached = SegmentLoader(fps, song_cache_bytes=1 << 30, **kw)
    direct = SegmentLoader(fps, **kw)
    for i in (0, 3):
        a, b = cached[i], direct[i]
        for k in ("anchors", "replicas", "bg"):
            np.testing.assert_allclose(a[k], b[k], atol=1e-7, err_msg=k)
    # cache is bounded: tiny capacity must still work (evicts, stays correct)
    tiny = SegmentLoader(fps, song_cache_bytes=200_000, **kw)
    np.testing.assert_allclose(tiny[0]["anchors"], direct[0]["anchors"],
                               atol=1e-7)
