"""Training workload: pjit/shard_map train loop over a data mesh.

Counterpart of the reference ``model/trainer.py:19-230``, restructured the
JAX way: one pure ``train_step`` (augment -> melspec -> specaug -> encoder
fwd/bwd -> optax update) jitted once over a ``('data',)`` mesh via
shard_map, with donated state buffers and a PRNG key threaded per step.
The NT-Xent all-gather and the gradient psum are the only collectives.

Key differences from the reference, all TPU-motivated:
  - time-domain augmentation happens inside the step (see ops/tdaug.py) —
    the host only ships raw waveforms;
  - the cross-replica loss is the only loss; on a 1-device mesh it equals
    the single-GPU formulation exactly (tested);
  - similarity-matrix images and loss scalars go through
    ExperimentHelper (orbax + TB/JSONL) instead of tf.summary.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from nafp_tpu.data.catalog import Dataset
from nafp_tpu.data.loader import prefetch
from nafp_tpu.losses.ntxent import ntxent_loss
from nafp_tpu.losses.triplet import online_triplet_loss
from nafp_tpu.models.nnfp import get_fingerprinter
from nafp_tpu.ops.melspec import get_melspec_fn
from nafp_tpu.ops.specaug import get_specaug_fn
from nafp_tpu.ops.tdaug import MAX_IR_LENGTH, augment_replicas
from nafp_tpu.optim.schedules import build_optimizer
from nafp_tpu.parallel.mesh import mesh_from_cfg
from nafp_tpu.search.minisearch import mini_search_eval
from nafp_tpu.train.experiment import ExperimentHelper


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_fp(cfg: Dict[str, Any], bn_axis=None):
    """melspec fn, specaug fn, FingerPrinter (reference build_fp,
    trainer.py:19-30).

    ``bn_axis`` names the mesh axis for cross-replica batch-norm statistics
    when ``MODEL.BN='batch_norm'`` trains on a multi-device mesh (pass None
    off-mesh); layer-norm models ignore it.
    """
    melspec_fn, mcfg = get_melspec_fn(cfg)
    specaug_fn = get_specaug_fn(cfg)
    model = get_fingerprinter(cfg, bn_axis=bn_axis)
    return melspec_fn, specaug_fn, model, mcfg


def init_params(cfg: Dict[str, Any], model, mcfg, seed: int = 42):
    shape = (1, mcfg.n_mels, mcfg.n_frames, 1)
    return jax.jit(model.init)(jax.random.PRNGKey(seed),
                               jnp.zeros(shape, jnp.float32))


# ---------------------------------------------------------------------------
# Steps (pure; called inside shard_map so 'data' axis is available)
# ---------------------------------------------------------------------------
def _make_loss_fn(cfg, melspec_fn, specaug_fn, model, train: bool,
                  aug_keys: Optional[frozenset] = None):
    loss_mode = str(cfg["LOSS"]["LOSS_MODE"]).upper()
    tau = float(cfg["LOSS"]["TAU"])
    margin = float(cfg["LOSS"]["MARGIN"])
    # Training-time mining mode for the triplet branch. The reference pins
    # 'semi-hard' (model/trainer.py:159-163); we default to that but expose
    # the loss's other reductions ('hardest', 'all', 'all-balanced') as
    # LOSS.MINING_MODE — measured here (CLAUDE.md training-dynamics notes),
    # the semi-hard hinge saturates at init on synthetic corpora, so the
    # alternates are the only way to study the branch's dynamics at all.
    mining_mode = str(cfg["LOSS"].get("MINING_MODE", "semi-hard"))
    snr = tuple(cfg["TD_AUG"]["TR_SNR" if train else "VAL_SNR"])
    use_bg = bool(cfg["TD_AUG"]["TR_BG_AUG" if train else "VAL_BG_AUG"])
    use_ir = bool(cfg["TD_AUG"]["TR_IR_AUG" if train else "VAL_IR_AUG"])
    use_speech = bool(cfg["TD_AUG"].get(
        "TR_SPEECH_AUG" if train else "VAL_SPEECH_AUG", False))

    def loss_fn(params, batch, key, axis_name: Optional[str], stats=None):
        # Which aug sources truly exist: _device_batch pads missing ones
        # with zero stand-ins (shard_map wants a fixed key set), so batch
        # membership alone would route clean replicas through the degenerate
        # zero-noise mix (max-norm + amp-scale). The trainer passes the host
        # loader's real source set; trace-time membership is the fallback
        # for direct callers feeding unpadded batches.
        have = aug_keys if aug_keys is not None else frozenset(
            k for k in ("bg", "ir", "speech") if k in batch)
        k_td, k_spec = jax.random.split(key)
        xa = batch["anchors"]
        xp = augment_replicas(batch["replicas"], batch.get("bg"),
                              batch.get("ir"), k_td, snr,
                              use_bg=use_bg and "bg" in have,
                              use_ir=use_ir and "ir" in have,
                              speech=batch.get("speech"),
                              use_speech=use_speech and "speech" in have)
        x = jnp.concatenate([xa, xp], axis=0)
        # pmax the subtract-max across the mesh: the reference normalizes by
        # the WHOLE batch's max, so a sharded batch must agree globally.
        feat = melspec_fn(x, axis_name=axis_name)
        if train:
            feat = specaug_fn(feat, k_spec)
        # BatchNorm models carry a mutable 'batch_stats' collection: in
        # training we normalize by (cross-replica) batch moments and return
        # the updated running stats; in eval the frozen running stats apply.
        if train and stats is not None:
            emb, new_stats = model.apply({**params, **stats}, feat,
                                         train=True,
                                         mutable=["batch_stats"])
            new_stats = dict(new_stats)
        else:
            emb = model.apply({**params, **(stats or {})}, feat, train=False)
            new_stats = None
        n_anchors = xa.shape[0]
        if loss_mode == "NTXENT":
            loss, sim = ntxent_loss(emb[:n_anchors], emb[n_anchors:],
                                    tau=tau, axis_name=axis_name)
        elif loss_mode == "ONLINE-TRIPLET":
            n_ppa = (emb.shape[0] - n_anchors) // n_anchors
            # Validation uses mode 'all' with margin 0, like the reference
            # (model/trainer.py:165-169).
            loss, sim, _ = online_triplet_loss(
                emb[:n_anchors], emb[n_anchors:], n_anchor=n_anchors,
                n_pos_per_anchor=n_ppa,
                margin=margin if train else 0.0,
                mode=mining_mode if train else "all")
            if axis_name is not None:
                loss = jax.lax.pmean(loss, axis_name)
        else:
            raise NotImplementedError(loss_mode)
        return loss, (sim, new_stats)

    return loss_fn


def make_train_step(cfg, melspec_fn, specaug_fn, model, optimizer,
                    mesh: Mesh, aug_keys: Optional[frozenset] = None):
    """Build the jitted sharded train step.

    Batch arrays are sharded over 'data'; state is replicated. Inside the
    shard each device computes its local grads of the global loss (the
    all-gather backward returns cross-device contributions) and grads are
    psum'd, so updates are identical on every device.
    """
    loss_fn = _make_loss_fn(cfg, melspec_fn, specaug_fn, model, train=True,
                            aug_keys=aug_keys)
    axis = "data" if mesh.size > 1 else None

    def step(state: TrainState, batch, key):
        key = jax.random.fold_in(key[0] if key.ndim > 1 else key, 0)
        if axis is not None:
            # decorrelate augmentation across devices
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        variables = state.params
        params = {"params": variables["params"]}
        stats = ({"batch_stats": variables["batch_stats"]}
                 if "batch_stats" in variables else None)
        (loss, (sim, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, key, axis, stats)
        if axis is not None:
            grads = jax.lax.psum(grads, axis)
            # sim is NOT truncated: the P('data') out-spec reassembles each
            # device's local rows into the full matrix, and the host only
            # fetches it at epoch end when SAVE_IMG is on (async otherwise).
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        if new_stats is not None:
            params = {**params, **new_stats}
        return TrainState(params, opt_state, state.step + 1), loss, sim

    if mesh.size == 1:
        return jax.jit(step, donate_argnums=(0,))

    batch_spec = {k: P("data") for k in
                  ("anchors", "replicas", "bg", "ir", "speech")}
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P(), P("data")))
    return jax.jit(sharded, donate_argnums=(0,))


def make_val_step(cfg, melspec_fn, specaug_fn, model, mesh: Mesh,
                  aug_keys: Optional[frozenset] = None):
    loss_fn = _make_loss_fn(cfg, melspec_fn, specaug_fn, model, train=False,
                            aug_keys=aug_keys)
    axis = "data" if mesh.size > 1 else None

    def step(params, batch, key):
        # `params` is the full variables dict (batch_stats ride along for
        # BN models; loss_fn's eval path applies frozen running stats).
        loss, (sim, _) = loss_fn(params, batch, key, axis)
        return loss, sim

    if mesh.size == 1:
        return jax.jit(step)
    batch_spec = {k: P("data") for k in
                  ("anchors", "replicas", "bg", "ir", "speech")}
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P("data")))
    return jax.jit(sharded)


def make_test_step(melspec_fn, model):
    """Taps for mini-search validation (reference trainer.py:67-77)."""
    def step(params, x):
        feat = melspec_fn(x)
        return model.apply(params, feat, method=model.taps)
    return jax.jit(step)


# ---------------------------------------------------------------------------
def mini_search_validation(ds, params, test_step, aug_fn=None,
                           scopes=(1, 3, 5, 9, 11, 19),
                           max_n_samples: int = 3000,
                           display: bool = True):
    """Build a mini DB/query from validation batches and run retrieval at
    three taps f / L2(f) / g(f) (reference trainer.py:80-108).

    ``aug_fn(replicas, bg, ir, key, speech=None) -> replicas`` applies the
    validation TD-augmentation so queries are degraded replicas like the
    reference's (whose val workers mix ALL enabled sources — bg, IR and
    speech, dataloader_keras.py:231-299; with VAL_SPEECH_AUG on, speech
    must corrupt the mini-search queries too, not just the val loss).
    """
    keys = ("f", "L2(f)", "g(f)")
    n_iter = max(1, min(len(ds), max_n_samples // ds.bsz))
    db = {k: [] for k in keys}
    query = {k: [] for k in keys}
    for i in range(n_iter):
        b = ds[i]
        xp = jnp.asarray(b["replicas"])
        if aug_fn is not None:
            xp = aug_fn(xp, jnp.asarray(b["bg"]) if "bg" in b else None,
                        jnp.asarray(b["ir"]) if "ir" in b else None,
                        jax.random.PRNGKey(i),
                        speech=(jnp.asarray(b["speech"])
                                if "speech" in b else None))
        x = jnp.concatenate([jnp.asarray(b["anchors"]), xp], axis=0)
        f, f_l2, gf = test_step(params, x)
        emb = dict(zip(keys, (f, f_l2, gf)))
        n_anchor = b["anchors"].shape[0]
        for k in keys:
            db[k].append(np.asarray(emb[k][:n_anchor]))
            query[k].append(np.asarray(emb[k][n_anchor:]))
    accs_by_scope = {}
    for k in keys:
        d = np.concatenate(db[k])
        q = np.concatenate(query[k])[:, None, :]  # (nQ, 1, dim)
        if display:
            print(f"== mini-search-validation [{k}] ==")
        accs_by_scope[k], _ = mini_search_eval(
            jnp.asarray(q), jnp.asarray(d), scopes=list(scopes),
            mode="argmin", display=display)
    return accs_by_scope, list(scopes), list(keys)


def _replicate(tree, mesh: Mesh):
    """Replicate host/device values across the (possibly multi-host) mesh.
    Single-process this is a plain device_put; multi-host builds global
    fully-replicated arrays from each process's identical host copy."""
    rep = NamedSharding(mesh, P())
    if jax.process_count() <= 1:
        return jax.device_put(tree, rep)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), rep,
            functools.partial(lambda v, idx: np.asarray(v)[idx], x)),
        tree)


def _put_global(x, sh: NamedSharding):
    """Host value -> mesh-global array. Single-process: a device_put; on a
    multi-host run each process contributes its local rows of the data
    axis (``jax.make_array_from_process_local_data`` assembles the global
    batch from per-host shards — the per-process song-list sharding in
    the catalog guarantees hosts feed disjoint data)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(jnp.asarray(x), sh)


_ZERO_STANDINS: Dict[tuple, Any] = {}


def _zeros_global(shape, sh: NamedSharding):
    """Constant zero stand-in, built ONCE per (shape, sharding) and reused
    every step. The old code device_put a fresh host np.zeros each step —
    besides the pointless per-step ship, the remote-TPU client retains the
    transfer host-side, which leaked ~10 MB/step (a 100-epoch bsz-640 run
    grew to 130 GB anon RSS and was OOM-killed at epoch 56). Stand-ins are
    read-only inside the step (only TrainState is donated), so sharing one
    device array across steps is safe."""
    key = (shape, sh)
    z = _ZERO_STANDINS.get(key)
    if z is None:
        z = _put_global(np.zeros(shape, np.float32), sh)
        _ZERO_STANDINS[key] = z
    return z


def _device_batch(batch, mesh: Mesh):
    """Ship a host batch to the mesh with batch-dim sharding."""
    sh = NamedSharding(mesh, P("data"))
    out = {}
    for k in ("anchors", "replicas", "bg", "ir", "speech"):
        if k in batch:
            out[k] = _put_global(batch[k], sh)
    # shard_map in_specs expect every key; supply cached zero stand-ins
    n_rep = np.shape(batch["replicas"])[0]
    rep_t = np.shape(batch["replicas"])[-1]
    if "bg" not in out:
        out["bg"] = _zeros_global((n_rep, rep_t), sh)
    if "speech" not in out:
        out["speech"] = _zeros_global((n_rep, rep_t), sh)
    if "ir" not in out:
        out["ir"] = _zeros_global((n_rep, MAX_IR_LENGTH), sh)
    return out


def trainer(cfg: Dict[str, Any], checkpoint_name: str) -> None:
    """The epoch loop (reference trainer.py:111-230)."""
    from nafp_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed(cfg)
    nproc = jax.process_count()
    if nproc > 1:
        # BSZ keys are the GLOBAL batch; each process loads 1/nproc of it
        # from its own song-list shard (catalog.get_train_ds/get_val_ds).
        b = dict(cfg["BSZ"])
        for k in ("TR_BATCH_SZ", "TR_N_ANCHOR", "VAL_BATCH_SZ",
                  "VAL_N_ANCHOR"):
            if b[k] % nproc:
                raise ValueError(f"BSZ.{k}={b[k]} not divisible by "
                                 f"{nproc} processes")
            b[k] = b[k] // nproc
        cfg = {**cfg, "BSZ": b}
    lead = jax.process_index() == 0
    dataset = Dataset(cfg)
    mesh = mesh_from_cfg(cfg)
    bn_axis = "data" if mesh.size > 1 else None
    melspec_fn, specaug_fn, model, mcfg = build_fp(cfg, bn_axis=bn_axis)
    print(f"[trainer] mesh: {mesh.shape} on {jax.devices()[0].platform}")

    train_ds = dataset.get_train_ds(cfg["DATA_SEL"]["REDUCE_ITEMS_P"])
    # Per-epoch step count every process agrees on: song-list shards can
    # differ by a batch, and a straggler entering a collective the others
    # skipped deadlocks the mesh. (Single-process: just len(train_ds).)
    steps_per_epoch = len(train_ds)
    val_steps = None
    if nproc > 1:
        from jax.experimental import multihost_utils
        steps_per_epoch = int(multihost_utils.process_allgather(
            np.int32(steps_per_epoch)).min())
    total_steps = int(cfg["TRAIN"]["MAX_EPOCH"]) * steps_per_epoch
    optimizer = build_optimizer(cfg, total_steps)

    # Optional device-resident corpus (DEVICE.DEVICE_CORPUS): songs live in
    # HBM as int16 and each step ships only (row, start) indices — the
    # TPU-native replacement for per-step waveform shipping when the corpus
    # fits (see data/device_corpus.py). Batches come back as device arrays;
    # everything downstream is unchanged.
    from nafp_tpu.data.device_corpus import (DeviceGatherLoader,
                                             maybe_device_loader)
    train_ds = maybe_device_loader(train_ds, cfg, label="train corpus")
    # Large-batch host-loader runs ship O(batch x T) waveform bytes every
    # step. Besides the link traffic, the remote-TPU tunnel client RETAINS
    # each transfer host-side (measured: a bsz-5120 host-loader epoch
    # ratchets RSS by ~the shipped volume, ~8 GB/epoch, until allocator
    # pressure stalls the decoder — same mechanism as the zero-stand-in
    # leak fixed in _zeros_global). DEVICE_CORPUS ships only index pairs
    # and is the intended mode for any corpus that fits HBM; warn loudly
    # instead of degrading silently.
    if (lead and not isinstance(train_ds, DeviceGatherLoader)
            and jax.default_backend() != "cpu"):
        seg = int(cfg["MODEL"]["DUR"] * cfg["MODEL"]["FS"])
        bsz = int(cfg["BSZ"]["TR_BATCH_SZ"])
        n_rep = bsz - int(cfg["BSZ"]["TR_N_ANCHOR"])
        n_aug = sum(bool(cfg["TD_AUG"].get(k)) for k in
                    ("TR_BG_AUG", "TR_IR_AUG", "TR_SPEECH_AUG"))
        per_step = 4 * seg * (bsz + n_rep * n_aug)
        if per_step > 64 << 20:
            print(f"[trainer] WARNING: host loader ships "
                  f"~{per_step / 2**20:.0f} MB/step at bsz {bsz}; on a "
                  f"remote-TPU backend the client retains transfers "
                  f"(host RSS grows ~shipped bytes). Set "
                  f"DEVICE.DEVICE_CORPUS: true if the corpus fits HBM.",
                  flush=True)

    params = init_params(cfg, model, mcfg)
    # Optimizer state covers the 'params' collection only; BN batch_stats
    # ride along in TrainState.params but are updated by the model, not
    # the optimizer.
    state = TrainState(params=params,
                       opt_state=optimizer.init({"params": params["params"]}),
                       step=jnp.zeros([], jnp.int32))

    helper = ExperimentHelper(checkpoint_name, cfg)
    restored = helper.restore_or_init(
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step})
    state = TrainState(restored["params"], restored["opt_state"],
                       restored["step"])
    # Replicate state across the mesh.
    state = _replicate(state, mesh)

    def _aug_keys(ds):
        return frozenset(k for k, flag in (("bg", ds.bg_mix),
                                           ("ir", ds.ir_mix),
                                           ("speech", ds.speech_mix)) if flag)

    val_ds = maybe_device_loader(dataset.get_val_ds(max_song=250), cfg,
                                 label="val corpus")
    val_steps = len(val_ds)
    if nproc > 1:
        from jax.experimental import multihost_utils
        val_steps = int(multihost_utils.process_allgather(
            np.int32(val_steps)).min())
    train_step = make_train_step(cfg, melspec_fn, specaug_fn, model,
                                 optimizer, mesh, aug_keys=_aug_keys(train_ds))
    val_step = make_val_step(cfg, melspec_fn, specaug_fn, model, mesh,
                             aug_keys=_aug_keys(val_ds))
    test_step = make_test_step(melspec_fn, model)

    val_aug = jax.jit(functools.partial(
        augment_replicas,
        snr_range=tuple(cfg["TD_AUG"]["VAL_SNR"]),
        use_bg=bool(cfg["TD_AUG"]["VAL_BG_AUG"]),
        use_ir=bool(cfg["TD_AUG"]["VAL_IR_AUG"]),
        use_speech=bool(cfg["TD_AUG"].get("VAL_SPEECH_AUG", False))))

    base_key = jax.random.PRNGKey(int(cfg["TRAIN"].get("SEED", 0)))
    ep_max = int(cfg["TRAIN"]["MAX_EPOCH"])
    host_step = int(state.step)  # one sync at start, none per step
    profile_dir = cfg["TRAIN"].get("PROFILE_DIR")
    from nafp_tpu.utils.profiling import StepTimer, trace
    for ep in range(helper.epoch, ep_max + 1):
        print(f"EPOCH: {ep}/{ep_max}")
        train_ds.set_epoch(ep)
        losses = []  # device scalars; converted once at epoch end
        sim = None
        timer = StepTimer()
        prof_ctx = (trace(profile_dir)
                    if profile_dir and ep == helper.epoch else None)
        if prof_ctx:
            prof_ctx.__enter__()
        for i, batch in enumerate(prefetch(train_ds)):
            if i >= steps_per_epoch:
                break
            key = jax.random.fold_in(base_key, host_step)
            if nproc > 1:
                key = _replicate(key, mesh)
            db = _device_batch(batch, mesh)
            state, loss, sim = train_step(state, db, key)
            host_step += 1
            losses.append(loss)
            timer.tick()
            if i % 50 == 0 and lead:
                print(f"  step {i}/{steps_per_epoch} tr_loss "
                      f"{float(loss):.4f} step {timer.step_ms:.0f} ms",
                      end="\r")
        if prof_ctx:
            prof_ctx.__exit__(None, None, None)
        tr_loss = (float(jnp.mean(jnp.stack(losses)))
                   if losses else float("nan"))
        if lead:
            helper.log_scalar("loss/train", tr_loss, ep)
            if timer.ema_dt:
                helper.log_scalar("throughput/segments_per_sec",
                                  timer.items_per_sec(train_ds.bsz * nproc),
                                  ep)
                helper.log_scalar("throughput/step_ms", timer.step_ms, ep)
        # sim is P('data')-sharded; fetching it needs every shard
        # addressable, which only holds single-process.
        if (nproc == 1 and cfg["TRAIN"].get("SAVE_IMG")
                and sim is not None and len(sim)):
            helper.log_sim_images("tr_sim_mtx", np.asarray(sim), ep)

        # Validation (no specaug; TD-aug per VAL_* flags — reference :201-213)
        val_losses = []
        for i, batch in enumerate(prefetch(val_ds)):
            if i >= val_steps:
                break
            key = jax.random.fold_in(base_key, 1_000_000 + ep * 10_000 + i)
            if nproc > 1:
                key = _replicate(key, mesh)
            db = _device_batch(batch, mesh)
            loss, sim = val_step(state.params, db, key)
            val_losses.append(float(loss))
        val_loss = float(np.mean(val_losses)) if val_losses else float("nan")
        if lead:
            helper.log_scalar("loss/val", val_loss, ep)
        if (nproc == 1 and cfg["TRAIN"].get("SAVE_IMG")
                and sim is not None and len(sim)):
            helper.log_sim_images("val_sim_mtx", np.asarray(sim), ep)
        if lead:
            print(f"tr_loss:{tr_loss:.4f}, val_loss:{val_loss:.4f}")

        # TRAIN.CHECKPOINT_INTERVAL (epochs, default 1 = reference parity:
        # save every epoch). A checkpoint fetches params+opt state to host;
        # hosts behind slow device links (or very short epochs) raise this.
        ckpt_every = int(cfg["TRAIN"].get("CHECKPOINT_INTERVAL", 1) or 1)
        if ep % ckpt_every == 0 or ep == ep_max:
            helper.save(ep, {"params": state.params,
                             "opt_state": state.opt_state,
                             "step": state.step})

        if cfg["TRAIN"].get("MINI_TEST_IN_TRAIN") and nproc > 1:
            if lead:
                print("[trainer] MINI_TEST_IN_TRAIN skipped on multi-host "
                      "(test_step jits process-local arrays; run the "
                      "monitor offline via evaluate instead)")
        elif cfg["TRAIN"].get("MINI_TEST_IN_TRAIN"):
            accs_by_scope, scopes, key_strs = mini_search_validation(
                val_ds, state.params, test_step,
                aug_fn=lambda xp, bg, ir, k, speech=None:
                val_aug(xp, bg, ir, k, speech=speech)
                if (bg is not None or ir is not None
                    or speech is not None) else xp)
            for k in key_strs:
                helper.update_minitest_acc(accs_by_scope[k], scopes, k, ep)
    helper.close()
