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
        lambda cfg: nnfp.FingerPrinter(norm="layer_norm2d",
                                       dtype=jnp.float32, **SMALL_MODEL))
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
