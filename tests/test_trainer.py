"""Trainer integration tests on synthetic audio (tiny model for speed)."""
import glob
import os
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nafp_tpu.configuration import load_config

FS = 8000
SMALL_MODEL = dict(emb_sz=16, front_hidden_ch=(8, 8, 16, 16, 32, 32, 64, 64))


def _write_wav(path, seconds, f0, fs=FS):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = np.arange(int(fs * seconds)) / fs
    rng = np.random.default_rng(hash(path) % 2**31)
    x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(len(t))
    pcm = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    with wave.open(path, "w") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    for i in range(4):
        _write_wav(f"{root}/music/train-10k-30s/{i}.wav", 4.0, 250 + 97 * i)
        _write_wav(f"{root}/music/val-query-db-500-30s/{i}.wav", 4.0,
                   300 + 97 * i)
    _write_wav(f"{root}/aug/bg/tr/0.wav", 4.0, 61)
    _write_wav(f"{root}/aug/ir/tr/0.wav", 0.1, 901)

    cfg = load_config("default")
    cfg["DIR"].update(SOURCE_ROOT_DIR=f"{root}/music/",
                      BG_ROOT_DIR=f"{root}/aug/bg/",
                      IR_ROOT_DIR=f"{root}/aug/ir/",
                      OUTPUT_ROOT_DIR=f"{root}/logs/emb/",
                      LOG_ROOT_DIR=f"{root}/logs/")
    cfg["BSZ"].update(TR_BATCH_SZ=8, TR_N_ANCHOR=4, VAL_BATCH_SZ=8,
                      VAL_N_ANCHOR=4, TS_BATCH_SZ=8)
    cfg["TRAIN"].update(MAX_EPOCH=1, TENSORBOARD=False, SAVE_IMG=False,
                        MINI_TEST_IN_TRAIN=True)
    cfg["DEVICE"]["MESH_DATA_PARALLEL"] = 1
    return cfg


def _small_model_fp(cfg):
    """build_fp with the tiny test encoder."""
    from nafp_tpu.models import nnfp
    from nafp_tpu.ops.melspec import get_melspec_fn
    from nafp_tpu.ops.specaug import get_specaug_fn
    melspec_fn, mcfg = get_melspec_fn(cfg)
    model = nnfp.FingerPrinter(norm="layer_norm2d", dtype=jnp.float32,
                               **SMALL_MODEL)
    return melspec_fn, get_specaug_fn(cfg), model, mcfg


def test_train_step_reduces_loss(tiny_cfg):
    from nafp_tpu.data.catalog import Dataset
    from nafp_tpu.optim.schedules import build_optimizer
    from nafp_tpu.parallel.mesh import make_data_mesh
    from nafp_tpu.train import trainer as T

    cfg = dict(tiny_cfg)
    melspec_fn, specaug_fn, model, mcfg = _small_model_fp(cfg)
    cfg["TRAIN"] = dict(cfg["TRAIN"], LR=3e-3)
    ds = Dataset(cfg).get_train_ds()
    opt = build_optimizer(cfg, 100)
    params = T.init_params(cfg, model, mcfg)
    state = T.TrainState(params, opt.init(params), jnp.zeros([], jnp.int32))
    mesh = make_data_mesh(1)
    step = T.make_train_step(cfg, melspec_fn, specaug_fn, model, opt, mesh)

    key = jax.random.PRNGKey(0)
    batch = ds[0]
    db = T._device_batch(batch, mesh)
    losses = []
    for i in range(8):
        state, loss, sim = step(state, db, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same batch -> loss must fall


def test_train_step_multidevice_mesh(tiny_cfg):
    """The sharded step must run on the full 8-device CPU mesh and produce
    a finite loss with identical replicated params."""
    from nafp_tpu.data.catalog import Dataset
    from nafp_tpu.optim.schedules import build_optimizer
    from nafp_tpu.parallel.mesh import make_data_mesh
    from nafp_tpu.train import trainer as T

    cfg = dict(tiny_cfg)
    cfg["BSZ"] = dict(cfg["BSZ"], TR_BATCH_SZ=16, TR_N_ANCHOR=8)
    melspec_fn, specaug_fn, model, mcfg = _small_model_fp(cfg)
    ds = Dataset(cfg).get_train_ds()
    opt = build_optimizer(cfg, 100)
    params = T.init_params(cfg, model, mcfg)
    state = T.TrainState(params, opt.init(params), jnp.zeros([], jnp.int32))
    mesh = make_data_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = T.make_train_step(cfg, melspec_fn, specaug_fn, model, opt, mesh)
    db = T._device_batch(ds[0], mesh)
    state, loss, _ = step(state, db, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # params stay replicated & identical across devices
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_full_trainer_loop_and_resume(tiny_cfg, monkeypatch):
    """Run trainer() for 1 epoch end-to-end, then resume into epoch 2."""
    from nafp_tpu.train import trainer as T
    from nafp_tpu.models import nnfp

    # shrink the model inside trainer via get_fingerprinter monkeypatch
    monkeypatch.setattr(
        T, "get_fingerprinter",
        lambda cfg, bn_axis=None: nnfp.FingerPrinter(
            norm="layer_norm2d", dtype=jnp.float32, **SMALL_MODEL))
    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in tiny_cfg.items()}
    T.trainer(cfg, "t_e2e")
    ckpt_dir = os.path.join(cfg["DIR"]["LOG_ROOT_DIR"], "checkpoint", "t_e2e")
    assert os.path.isdir(ckpt_dir)
    metrics = glob.glob(os.path.join(cfg["DIR"]["LOG_ROOT_DIR"], "fit",
                                     "t_e2e", "*", "metrics.jsonl"))
    assert metrics, "metrics.jsonl must be written"
    body = open(metrics[0]).read()
    assert "loss/train" in body and "loss/val" in body
    assert "mini_search/top1_g(f)_scope1" in body

    # Resume: bump MAX_EPOCH to 2; must restore epoch 1 and train epoch 2.
    cfg["TRAIN"]["MAX_EPOCH"] = 2
    T.trainer(cfg, "t_e2e")
    import orbax.checkpoint as ocp
    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    assert mgr.latest_step() == 2


def test_mesh_step_matches_single_device(tiny_cfg):
    """With stochastic aug disabled, the 8-device sharded step must equal
    the single-device step bit-for-tolerance — this pins the melspec
    subtract-max pmax (the reference normalizes by the WHOLE batch max,
    melspectrogram.py:107-109, so shards must agree globally)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nafp_tpu.data.catalog import Dataset
    from nafp_tpu.models import nnfp
    from nafp_tpu.ops.melspec import get_melspec_fn
    from nafp_tpu.ops.specaug import get_specaug_fn
    from nafp_tpu.optim.schedules import build_optimizer
    from nafp_tpu.parallel.mesh import make_data_mesh
    from nafp_tpu.train import trainer as T

    cfg = dict(tiny_cfg)
    cfg["BSZ"] = dict(cfg["BSZ"], TR_BATCH_SZ=16, TR_N_ANCHOR=8)
    cfg["SPEC_AUG"] = dict(cfg["SPEC_AUG"], SPECAUG_CHAIN=[])
    melspec_fn, mcfg = get_melspec_fn(cfg)
    specaug_fn = get_specaug_fn(cfg)
    ds = Dataset(cfg).get_train_ds()
    opt = build_optimizer(cfg, 100)
    batch = ds[0]
    model = nnfp.FingerPrinter(norm="layer_norm2d", dtype=jnp.float32,
                               **SMALL_MODEL)

    def run(n_dev):
        params = T.init_params(cfg, model, mcfg)
        state = T.TrainState(params, opt.init({"params": params["params"]}),
                             jnp.zeros([], jnp.int32))
        mesh = make_data_mesh(n_dev)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        step = T.make_train_step(cfg, melspec_fn, specaug_fn, model, opt,
                                 mesh, aug_keys=frozenset())
        db = T._device_batch(batch, mesh)
        state, loss, _ = step(state, db, jax.random.PRNGKey(0))
        return float(loss)

    np.testing.assert_allclose(run(1), run(8), rtol=2e-5)


def test_batchnorm_training_cross_replica(tiny_cfg):
    """BN training threads mutable batch_stats through the step; the
    8-device mesh with cross-replica stat sync (nn.BatchNorm axis_name)
    must reproduce the single-device math, and stats must move off init.
    (The reference trains BN but never syncs stats across replicas —
    its nnfp.py:178 warns of exactly that.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nafp_tpu.data.catalog import Dataset
    from nafp_tpu.models import nnfp
    from nafp_tpu.ops.melspec import get_melspec_fn
    from nafp_tpu.ops.specaug import get_specaug_fn
    from nafp_tpu.optim.schedules import build_optimizer
    from nafp_tpu.parallel.mesh import make_data_mesh
    from nafp_tpu.train import trainer as T

    cfg = dict(tiny_cfg)
    cfg["BSZ"] = dict(cfg["BSZ"], TR_BATCH_SZ=16, TR_N_ANCHOR=8)
    cfg["MODEL"] = dict(cfg["MODEL"], BN="batch_norm")
    # disable stochastic aug so 1-dev and 8-dev runs see identical inputs
    cfg["SPEC_AUG"] = dict(cfg["SPEC_AUG"], SPECAUG_CHAIN=[])
    melspec_fn, mcfg = get_melspec_fn(cfg)
    specaug_fn = get_specaug_fn(cfg)
    ds = Dataset(cfg).get_train_ds()
    opt = build_optimizer(cfg, 100)
    batch = ds[0]

    def run(n_dev):
        model = nnfp.FingerPrinter(norm="batch_norm", dtype=jnp.float32,
                                   bn_axis="data" if n_dev > 1 else None,
                                   **SMALL_MODEL)
        params = T.init_params(cfg, model, mcfg)
        assert "batch_stats" in params
        # host copy: the step donates state, deleting the init buffers
        init_stats = jax.tree_util.tree_map(np.asarray,
                                            params["batch_stats"])
        state = T.TrainState(params,
                             opt.init({"params": params["params"]}),
                             jnp.zeros([], jnp.int32))
        mesh = make_data_mesh(n_dev)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        step = T.make_train_step(cfg, melspec_fn, specaug_fn, model, opt,
                                 mesh, aug_keys=frozenset())
        db = T._device_batch(batch, mesh)
        state, l0, _ = step(state, db, jax.random.PRNGKey(0))
        state, l1, _ = step(state, db, jax.random.PRNGKey(1))
        return state, float(l0), float(l1), init_stats

    s1, l1a, l1b, init_stats = run(1)
    s8, l8a, l8b, _ = run(8)
    assert np.isfinite([l1a, l1b, l8a, l8b]).all()
    # cross-replica == single-device
    np.testing.assert_allclose(l1a, l8a, rtol=2e-4)
    np.testing.assert_allclose(l1b, l8b, rtol=2e-3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-3, atol=2e-5),
        s1.params["batch_stats"], s8.params["batch_stats"])
    # running stats must have moved off their init values
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s1.params["batch_stats"], init_stats)
    assert max(jax.tree_util.tree_leaves(moved)) > 1e-6


def test_full_trainer_loop_batchnorm(tiny_cfg, monkeypatch):
    """trainer() end-to-end with MODEL.BN='batch_norm': batch_stats are
    trained, checkpointed, and used by val/mini-search (frozen) paths."""
    from nafp_tpu.models import nnfp
    from nafp_tpu.train import trainer as T

    monkeypatch.setattr(
        T, "get_fingerprinter",
        lambda cfg, bn_axis=None: nnfp.FingerPrinter(
            norm="batch_norm", bn_axis=bn_axis, dtype=jnp.float32,
            **SMALL_MODEL))
    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in tiny_cfg.items()}
    cfg["MODEL"]["BN"] = "batch_norm"
    T.trainer(cfg, "t_bn")
    ckpt_dir = os.path.join(cfg["DIR"]["LOG_ROOT_DIR"], "checkpoint", "t_bn")
    assert os.path.isdir(ckpt_dir)


def test_train_step_lamb_multidevice(tiny_cfg):
    """The bsz-5120-style recipe: LAMB + cross-replica NT-Xent on a mesh."""
    from nafp_tpu.data.catalog import Dataset
    from nafp_tpu.optim.schedules import build_optimizer
    from nafp_tpu.parallel.mesh import make_data_mesh
    from nafp_tpu.train import trainer as T
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = dict(tiny_cfg)
    cfg["BSZ"] = dict(cfg["BSZ"], TR_BATCH_SZ=16, TR_N_ANCHOR=8)
    cfg["TRAIN"] = dict(cfg["TRAIN"], OPTIMIZER="LAMB")
    melspec_fn, specaug_fn, model, mcfg = _small_model_fp(cfg)
    ds = Dataset(cfg).get_train_ds()
    opt = build_optimizer(cfg, 100)
    params = T.init_params(cfg, model, mcfg)
    state = T.TrainState(params, opt.init(params), jnp.zeros([], jnp.int32))
    mesh = make_data_mesh(8)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = T.make_train_step(cfg, melspec_fn, specaug_fn, model, opt, mesh)
    db = T._device_batch(ds[0], mesh)
    state, loss, _ = step(state, db, jax.random.PRNGKey(0))
    state, loss2, _ = step(state, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))


def test_train_step_triplet_reduces_loss(tiny_cfg):
    """The now_playing recipe's trainer branch (reference
    config/now_playing.yaml:80, model/trainer.py:159-169): semi-hard
    online triplet loss, N/5 anchors, must train on a fixed batch."""
    from nafp_tpu.data.catalog import Dataset
    from nafp_tpu.optim.schedules import build_optimizer
    from nafp_tpu.parallel.mesh import make_data_mesh
    from nafp_tpu.train import trainer as T

    cfg = dict(tiny_cfg)
    cfg["BSZ"] = dict(cfg["BSZ"], TR_BATCH_SZ=10, TR_N_ANCHOR=2)
    cfg["LOSS"] = dict(cfg["LOSS"], LOSS_MODE="Online-Triplet", MARGIN=0.5)
    cfg["TRAIN"] = dict(cfg["TRAIN"], LR=3e-3)
    melspec_fn, specaug_fn, model, mcfg = _small_model_fp(cfg)
    ds = Dataset(cfg).get_train_ds()
    opt = build_optimizer(cfg, 100)
    params = T.init_params(cfg, model, mcfg)
    state = T.TrainState(params, opt.init(params), jnp.zeros([], jnp.int32))
    mesh = make_data_mesh(1)
    step = T.make_train_step(cfg, melspec_fn, specaug_fn, model, opt, mesh)
    db = T._device_batch(ds[0], mesh)
    losses = []
    for i in range(8):
        state, loss, sim = step(state, db, jax.random.fold_in(
            jax.random.PRNGKey(0), i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_train_step_triplet_mining_mode_knob(tiny_cfg):
    """LOSS.MINING_MODE reaches the loss: 'hardest' scores the same batch
    differently from the default 'semi-hard' (mean-over-elements vs
    hardest-positive/closest-negative hinge), and both step finitely.
    Knob added because the reference's pinned semi-hard saturates at init
    on synthetic corpora (CLAUDE.md training-dynamics notes)."""
    from nafp_tpu.data.catalog import Dataset
    from nafp_tpu.optim.schedules import build_optimizer
    from nafp_tpu.parallel.mesh import make_data_mesh
    from nafp_tpu.train import trainer as T

    losses = {}
    for mode in ("semi-hard", "hardest"):
        cfg = dict(tiny_cfg)
        cfg["BSZ"] = dict(cfg["BSZ"], TR_BATCH_SZ=10, TR_N_ANCHOR=2)
        cfg["LOSS"] = dict(cfg["LOSS"], LOSS_MODE="Online-Triplet",
                           MARGIN=0.5, MINING_MODE=mode)
        melspec_fn, specaug_fn, model, mcfg = _small_model_fp(cfg)
        ds = Dataset(cfg).get_train_ds()
        opt = build_optimizer(cfg, 100)
        params = T.init_params(cfg, model, mcfg)
        state = T.TrainState(params, opt.init(params),
                             jnp.zeros([], jnp.int32))
        mesh = make_data_mesh(1)
        step = T.make_train_step(cfg, melspec_fn, specaug_fn, model, opt,
                                 mesh)
        db = T._device_batch(ds[0], mesh)
        _, loss, _ = step(state, db, jax.random.PRNGKey(0))
        losses[mode] = float(loss)
    assert np.isfinite(list(losses.values())).all()
    assert losses["semi-hard"] != losses["hardest"]


def test_minisearch_val_speech_aug_reaches_queries(tiny_cfg, monkeypatch):
    """With VAL_SPEECH_AUG on, the mini-search queries must be speech-
    corrupted — the reference's val workers mix ALL enabled sources
    (dataloader_keras.py:231-299), so the in-training retrieval monitor
    and the val loss must see the same corruption model (VERDICT r4
    weak #1)."""
    import functools

    from nafp_tpu.data.catalog import Dataset
    from nafp_tpu.ops.tdaug import augment_replicas
    from nafp_tpu.train import trainer as T

    root = os.path.dirname(tiny_cfg["DIR"]["BG_ROOT_DIR"].rstrip("/"))
    for i in range(2):  # dev/ split backs VAL_SPEECH_AUG
        _write_wav(f"{root}/speech/dev/{i}.wav", 4.0, 137 + 50 * i)

    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in tiny_cfg.items()}
    cfg["DIR"]["SPEECH_ROOT_DIR"] = f"{root}/speech/"
    cfg["TD_AUG"].update(VAL_SPEECH_AUG=True, VAL_BG_AUG=True,
                         VAL_IR_AUG=False)
    melspec_fn, _, model, mcfg = _small_model_fp(cfg)
    params = T.init_params(cfg, model, mcfg)
    test_step = T.make_test_step(melspec_fn, model)
    val_ds = Dataset(cfg).get_val_ds()
    assert val_ds.speech_mix, "val loader must carry speech batches"
    assert "speech" in val_ds[0]

    captured = []
    real_eval = T.mini_search_eval

    def spy(q, d, **kw):
        captured.append(np.asarray(q))
        return real_eval(q, d, **kw)

    monkeypatch.setattr(T, "mini_search_eval", spy)

    def run(use_speech):
        captured.clear()
        val_aug = jax.jit(functools.partial(
            augment_replicas, snr_range=tuple(cfg["TD_AUG"]["VAL_SNR"]),
            use_bg=True, use_ir=False, use_speech=use_speech))
        T.mini_search_validation(
            val_ds, params, test_step,
            aug_fn=lambda xp, bg, ir, k, speech=None:
            val_aug(xp, bg, ir, k, speech=speech),
            display=False)
        return [c.copy() for c in captured]

    q_no_speech = run(False)
    q_speech = run(True)
    # same PRNG keys, same bg -> any difference comes from the speech mix
    assert any(not np.array_equal(a, b)
               for a, b in zip(q_no_speech, q_speech))


def test_full_trainer_loop_triplet(tiny_cfg, monkeypatch):
    """trainer() end-to-end with LOSS.LOSS_MODE='Online-Triplet' — the
    val loop uses mode 'all' margin 0 like the reference (trainer.py:165-169)."""
    from nafp_tpu.models import nnfp
    from nafp_tpu.train import trainer as T

    monkeypatch.setattr(
        T, "get_fingerprinter",
        lambda cfg, bn_axis=None: nnfp.FingerPrinter(
            norm="layer_norm2d", dtype=jnp.float32, **SMALL_MODEL))
    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in tiny_cfg.items()}
    cfg["BSZ"].update(TR_BATCH_SZ=10, TR_N_ANCHOR=2)
    cfg["LOSS"].update(LOSS_MODE="Online-Triplet", MARGIN=0.5)
    T.trainer(cfg, "t_trip")
    ckpt_dir = os.path.join(cfg["DIR"]["LOG_ROOT_DIR"], "checkpoint",
                            "t_trip")
    assert os.path.isdir(ckpt_dir)
    metrics = glob.glob(os.path.join(cfg["DIR"]["LOG_ROOT_DIR"], "fit",
                                     "t_trip", "*", "metrics.jsonl"))
    assert metrics and "loss/val" in open(metrics[0]).read()


def test_device_batch_zero_standins_are_cached():
    """Missing aug sources must map to ONE cached device array per (shape,
    sharding), not a fresh host np.zeros shipped every step — the
    re-shipping retained ~10 MB/step host-side through the remote-TPU
    client and OOM-killed 100-epoch runs (fixed round 5)."""
    from nafp_tpu.parallel.mesh import make_data_mesh
    from nafp_tpu.train import trainer as T

    mesh = make_data_mesh(1)
    batch = {"anchors": np.zeros((4, 256), np.float32),
             "replicas": np.zeros((4, 256), np.float32)}
    a = T._device_batch(batch, mesh)
    b = T._device_batch(batch, mesh)
    for k in ("bg", "ir", "speech"):
        assert a[k] is b[k], f"{k} stand-in rebuilt instead of cached"
    assert float(jnp.abs(a["speech"]).max()) == 0.0
    assert a["ir"].shape == (4, T.MAX_IR_LENGTH)
