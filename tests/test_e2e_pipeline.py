"""End-to-end smoke: train -> generate -> evaluate on synthetic audio.

Mirrors the reference's full workflow (run.py train/generate/evaluate) with
a tiny encoder. Query WAVs are noisy copies of db WAVs, so a trained model
must retrieve them; the exact (l2) index and the sequence re-ranker carry
the protocol.
"""
import os
import wave

import numpy as np
import pytest

from nafp_tpu.configuration import load_config

FS = 8000


def _write_wav(path, x):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "w") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(FS)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def e2e_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    rng = np.random.default_rng(0)

    def song(seed, sec=6.0):
        r = np.random.default_rng(seed)
        t = np.arange(int(FS * sec)) / FS
        x = np.zeros_like(t)
        for _ in range(3):  # random harmonic mixture
            f0 = r.uniform(100, 3500)
            x += r.uniform(0.2, 0.5) * np.sin(2 * np.pi * f0 * t + r.uniform(0, 6))
        return 0.8 * x / np.abs(x).max()

    for i in range(6):
        _write_wav(f"{root}/music/train-10k-30s/{i:02d}.wav", song(i))
        _write_wav(f"{root}/music/val-query-db-500-30s/{i:02d}.wav",
                   song(100 + i))
    for i in range(4):
        db = song(200 + i)
        _write_wav(f"{root}/music/test-query-db-500-30s/db/{i:02d}.wav", db)
        noisy = db + 0.05 * rng.standard_normal(len(db))
        _write_wav(f"{root}/music/test-query-db-500-30s/query/{i:02d}.wav",
                   noisy)
    for i in range(3):
        _write_wav(f"{root}/music/test-dummy-db-100k-full/{i:02d}.wav",
                   song(300 + i))
    _write_wav(f"{root}/aug/bg/tr/0.wav", song(400, 6.0) * 0.5)
    _write_wav(f"{root}/aug/ir/tr/0.wav",
               np.exp(-np.arange(800) / 100.0) *
               np.random.default_rng(5).standard_normal(800) * 0.3)

    cfg = load_config("default")
    cfg["DIR"].update(SOURCE_ROOT_DIR=f"{root}/music/",
                      BG_ROOT_DIR=f"{root}/aug/bg/",
                      IR_ROOT_DIR=f"{root}/aug/ir/",
                      OUTPUT_ROOT_DIR=f"{root}/logs/emb/",
                      LOG_ROOT_DIR=f"{root}/logs/")
    cfg["MODEL"].update(EMB_SZ=32, FRONT_HIDDEN_CH=[16, 16, 32, 32, 32, 32,
                                                    64, 64],
                        MIXED_PRECISION=False)
    cfg["BSZ"].update(TR_BATCH_SZ=16, TR_N_ANCHOR=8, VAL_BATCH_SZ=16,
                      VAL_N_ANCHOR=8, TS_BATCH_SZ=16)
    cfg["TRAIN"].update(MAX_EPOCH=3, TENSORBOARD=False, SAVE_IMG=False,
                        MINI_TEST_IN_TRAIN=False, LR=2e-3)
    return cfg


def test_full_pipeline(e2e_cfg):
    from nafp_tpu.train.trainer import trainer
    from nafp_tpu.generate import generate_fingerprint
    from nafp_tpu.search.evaluate import eval_fingerprints

    trainer(e2e_cfg, "e2e")

    out_dir = generate_fingerprint(e2e_cfg, "e2e", assume_yes=True)
    for key in ("dummy_db", "db", "query"):
        assert os.path.exists(os.path.join(out_dir, f"{key}.mm"))
        assert os.path.exists(os.path.join(out_dir, f"{key}_shape.npy"))
    q_shape = np.load(os.path.join(out_dir, "query_shape.npy"))
    db_shape = np.load(os.path.join(out_dir, "db_shape.npy"))
    assert tuple(q_shape) == tuple(db_shape)  # same 4 songs
    assert q_shape[1] == 32

    rates = eval_fingerprints(out_dir, index_type="l2", test_ids="all",
                              test_seq_len="1 3 5")
    assert rates.shape == (4, 3)
    # Trained on matching distribution: top-10 at seq-len 5 must be strong.
    assert rates[3, -1] >= 60.0, f"top10@5seg too low: {rates}"
    # longer sequences never hurt top1-near dramatically
    assert rates[1, -1] >= rates[1, 0] - 30.0
    # artifacts
    assert os.path.exists(os.path.join(out_dir, "raw_score.npy"))
    assert os.path.exists(os.path.join(out_dir, "test_ids.npy"))


def test_train_with_speech_aug(e2e_cfg):
    """Speech TD-aug end-to-end: the loader ships speech segments and the
    jitted step routes replicas through the bg+speech sum path (reference
    dataloader_keras.py:231-299 semantics: speech is a second noise source
    mixed like bg)."""
    from nafp_tpu.data.catalog import Dataset
    from nafp_tpu.train.trainer import trainer

    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in e2e_cfg.items()}
    root = os.path.dirname(cfg["DIR"]["BG_ROOT_DIR"].rstrip("/"))
    speech_root = f"{root}/speech/"
    rng = np.random.default_rng(42)
    for i in range(2):  # babble-like band-limited noise as "speech"
        x = rng.standard_normal(FS * 4)
        x = np.convolve(x, np.ones(16) / 16, mode="same")
        _write_wav(f"{speech_root}train/{i}.wav", 0.4 * x / np.abs(x).max())
    cfg["DIR"]["SPEECH_ROOT_DIR"] = speech_root
    cfg["TD_AUG"]["TR_SPEECH_AUG"] = True
    cfg["TRAIN"]["MAX_EPOCH"] = 1

    ds = Dataset(cfg).get_train_ds(0)
    assert ds.speech_mix, "speech sources not picked up by the loader"
    assert "speech" in ds[0], "loader batch missing speech segments"
    assert np.abs(ds[0]["speech"]).max() > 0

    trainer(cfg, "e2e_speech")  # full epoch through the jitted step
    ckpt = os.path.join(cfg["DIR"]["LOG_ROOT_DIR"], "checkpoint",
                        "e2e_speech")
    assert os.path.isdir(ckpt)


def test_generate_custom_source(e2e_cfg):
    from nafp_tpu.generate import generate_fingerprint
    src = e2e_cfg["DIR"]["SOURCE_ROOT_DIR"] + "test-query-db-500-30s/db/"
    out_dir = generate_fingerprint(e2e_cfg, "e2e", source_root_dir=src,
                                   output_root_dir=e2e_cfg["DIR"]
                                   ["OUTPUT_ROOT_DIR"] + "custom/")
    assert os.path.exists(os.path.join(out_dir, "custom_source.mm"))


def test_generate_sharded_matches_single_device(e2e_cfg):
    """Sharded generate (fp pass over the 8-device CPU mesh, batch rows not
    a mesh multiple so the host-side pad path runs) writes memmaps equal to
    the single-device pass. Reference counterpart ``model/generate.py:
    170-180`` ran its pass on one GPU; here the pass rides ('data',)."""
    from nafp_tpu.data.audio_io import load_memmap
    from nafp_tpu.generate import generate_fingerprint

    outs = {}
    for tag, ndev in (("gen1", 1), ("gen8", 8)):
        cfg = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in e2e_cfg.items()}
        cfg["DEVICE"]["MESH_DATA_PARALLEL"] = ndev
        cfg["BSZ"]["TS_BATCH_SZ"] = 6  # not a multiple of 8: pads to 8
        outs[tag] = generate_fingerprint(
            cfg, "e2e", assume_yes=True,
            output_root_dir=e2e_cfg["DIR"]["OUTPUT_ROOT_DIR"] + tag + "/")
    for key in ("dummy_db", "db", "query"):
        a, _ = load_memmap(outs["gen1"], key, display=False)
        b, _ = load_memmap(outs["gen8"], key, display=False)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, err_msg=key)


def test_eval_host_rescoring_matches_device(e2e_cfg):
    """The host (large-DB) scorer must reproduce the device scorer."""
    import nafp_tpu.search.evaluate as E
    rng = np.random.default_rng(0)
    recon = rng.standard_normal((500, 16)).astype(np.float32)
    q_seq = rng.standard_normal((4, 3, 16)).astype(np.float32)
    cands = rng.integers(-1, 500, (4, 12))
    import jax.numpy as jnp
    n_seg = np.array([3, 3, 2, 3], np.int32)
    q_seq[2, 2:] = 0.0
    s_dev, c_dev = E._score_candidates(jnp.asarray(q_seq),
                                       jnp.asarray(cands),
                                       jnp.asarray(recon), 3,
                                       jnp.asarray(n_seg))
    s_host, c_host = E._score_candidates_host(q_seq, np.asarray(cands),
                                              recon, 3, n_seg)
    np.testing.assert_array_equal(np.asarray(c_dev), c_host)
    np.testing.assert_allclose(np.asarray(s_dev), s_host, rtol=1e-4,
                               atol=1e-5)


def test_tail_query_scores_truncated_window():
    """A tail test id with n_seg < sl must still be able to match its
    ground-truth window at the DB end (the reference scores the shorter
    diagonal, eval_faiss.py:222-229). Regression: such candidates were
    marked invalid whenever start + sl > n."""
    import jax.numpy as jnp

    import nafp_tpu.search.evaluate as E
    rng = np.random.default_rng(1)
    n, d, sl = 100, 16, 5
    recon = rng.standard_normal((n, d)).astype(np.float32)
    recon /= np.linalg.norm(recon, axis=1, keepdims=True)
    # query = the last 2 DB rows; an sl=5 window would overrun the DB end
    n_seg = np.array([2], np.int32)
    q_seq = np.zeros((1, sl, d), np.float32)
    q_seq[0, :2] = recon[98:100]
    cands = np.array([[98, 50, 10, -1]], np.int32)
    s_dev, c_dev = E._score_candidates(jnp.asarray(q_seq),
                                       jnp.asarray(cands),
                                       jnp.asarray(recon), sl,
                                       jnp.asarray(n_seg))
    s, c = np.asarray(s_dev), np.asarray(c_dev)
    gt_pos = int(np.where(c[0] == 98)[0][0])
    assert np.isfinite(s[0, gt_pos]), "tail ground truth marked invalid"
    assert int(np.argmax(s[0])) == gt_pos
    np.testing.assert_allclose(s[0, gt_pos], 1.0, rtol=1e-5)
    # host mirror agrees
    s_h, c_h = E._score_candidates_host(q_seq, cands, recon, sl, n_seg)
    np.testing.assert_array_equal(c, c_h)
    mask = np.isfinite(s)
    np.testing.assert_array_equal(mask, np.isfinite(s_h))
    np.testing.assert_allclose(s[mask], s_h[mask], rtol=1e-4)


def test_icassp_asset_resolution(monkeypatch):
    """'icassp' test ids come from the packaged asset only; a missing
    asset errors loudly instead of falling back to a CWD-wide glob."""
    import nafp_tpu.search.evaluate as E
    ids = np.load(E._icassp_asset_path())
    assert ids.ndim == 1 and len(ids) == 2000  # the fixed 2000-id protocol
    real_exists = os.path.exists
    monkeypatch.setattr(
        E.os.path, "exists",
        lambda p: False if p.endswith(".npy") else real_exists(p))
    with pytest.raises(FileNotFoundError, match="test_ids='all'"):
        E._icassp_asset_path()


def test_merged_recon_memmap(tmp_path, monkeypatch):
    """Past MERGE_RAM_LIMIT the dummy+db merge is an on-disk memmap with
    identical content to the in-RAM concatenate."""
    import nafp_tpu.search.evaluate as E
    rng = np.random.default_rng(2)
    dummy = rng.standard_normal((300, 8)).astype(np.float32)
    db = rng.standard_normal((70, 8)).astype(np.float32)
    ref = np.concatenate([dummy, db])
    monkeypatch.setattr(E, "MERGE_RAM_LIMIT", 0)
    out = E._merged_recon(str(tmp_path), dummy, db)
    assert isinstance(out, np.memmap)
    np.testing.assert_array_equal(np.asarray(out), ref)
    # second call reuses the file
    out2 = E._merged_recon(str(tmp_path), dummy, db)
    np.testing.assert_array_equal(np.asarray(out2), ref)


def test_generate_unseen_syn(e2e_cfg):
    """'unseen_syn' mode: queries synthesized on-device from the val db."""
    from nafp_tpu.generate import generate_fingerprint
    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in e2e_cfg.items()}
    ckpt = os.path.join(cfg["DIR"]["LOG_ROOT_DIR"], "checkpoint", "e2e")
    if not os.path.isdir(ckpt):  # order-independent: train briefly
        from nafp_tpu.train.trainer import trainer
        cfg_t = {k: (dict(v) if isinstance(v, dict) else v)
                 for k, v in cfg.items()}
        cfg_t["TRAIN"]["MAX_EPOCH"] = 1
        trainer(cfg_t, "e2e")
    cfg["DATA_SEL"]["TEST_QUERY_DB"] = "unseen_syn"
    # need a val db/ subdir for the synthesized queries
    src_root = cfg["DIR"]["SOURCE_ROOT_DIR"]
    import shutil, glob as g
    os.makedirs(src_root + "val-query-db-500-30s/db/", exist_ok=True)
    for f in g.glob(src_root + "val-query-db-500-30s/*.wav"):
        shutil.copy(f, src_root + "val-query-db-500-30s/db/")
    out_dir = generate_fingerprint(
        cfg, "e2e", skip_dummy=True, assume_yes=True,
        output_root_dir=cfg["DIR"]["OUTPUT_ROOT_DIR"] + "syn/")
    q = np.load(os.path.join(out_dir, "query_shape.npy"))
    db = np.load(os.path.join(out_dir, "db_shape.npy"))
    assert q[0] == db[0] > 0     # one synthesized query per db segment
    qm = np.memmap(os.path.join(out_dir, "query.mm"), dtype=np.float32,
                   mode="r", shape=tuple(q))
    assert np.abs(np.asarray(qm)).max() > 0  # real embeddings, not zeros
