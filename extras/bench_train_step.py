#!/usr/bin/env python
"""Single-chip train-step microbench at arbitrary batch size.

Purpose (VERDICT r4 next #2): the ``tpu_5120`` preset ships the
cross-replica NT-Xent loss precisely to unlock the reference's
struck-through bsz-5120 TPU row (reference ``README.md:39``,
``NTxent_loss_tpu.py:19-24`` — written for TPUs but never wired), yet no
step-time / HBM / throughput number existed for it. This times the REAL
jitted train step exactly as the trainer builds it (same loss, optimizer,
donation, sharding), fed a device-resident synthetic batch so the tunnel
never sits inside the timed region, and reports step ms, segments/s, and
live HBM. ``--probe`` halves the batch until the step fits, reporting the
largest working size.

Usage:
    python extras/bench_train_step.py -c tpu_5120 [--steps 20] [--probe]
    python extras/bench_train_step.py -c 640_lamb --bsz 640
"""
import argparse
import json
import sys
import time
import os

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(cfg, bsz: int, steps: int):
    from nafp_tpu.configuration import update_config
    from nafp_tpu.optim.schedules import build_optimizer
    from nafp_tpu.parallel.mesh import mesh_from_cfg
    from nafp_tpu.train import trainer as T
    from nafp_tpu.utils.device import device_memory_stats

    cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in cfg.items()}
    update_config(cfg, "BSZ", "TR_BATCH_SZ", bsz)
    update_config(cfg, "BSZ", "TR_N_ANCHOR", bsz // 2)

    mesh = mesh_from_cfg(cfg)
    bn_axis = "data" if mesh.size > 1 else None
    melspec_fn, specaug_fn, model, mcfg = T.build_fp(cfg, bn_axis=bn_axis)
    optimizer = build_optimizer(cfg, 100 * 184)
    params = T.init_params(cfg, model, mcfg)
    state = T.TrainState(
        params=params,
        opt_state=optimizer.init({"params": params["params"]}),
        step=jnp.zeros([], jnp.int32))
    state = T._replicate(state, mesh)
    step_fn = T.make_train_step(cfg, melspec_fn, specaug_fn, model,
                                optimizer, mesh,
                                aug_keys=frozenset(("bg", "ir")))

    n_anchor = bsz // 2
    fs, dur = int(cfg["MODEL"]["FS"]), float(cfg["MODEL"]["DUR"])
    seg = int(fs * dur)
    rng = np.random.default_rng(0)
    host = {
        "anchors": rng.standard_normal((n_anchor, seg)).astype(np.float32),
        "replicas": rng.standard_normal((n_anchor, seg)).astype(np.float32),
        "bg": rng.standard_normal((n_anchor, seg)).astype(np.float32) * .1,
        "ir": rng.standard_normal((n_anchor, T.MAX_IR_LENGTH)).astype(
            np.float32) * .1,
    }
    batch = T._device_batch(host, mesh)     # shipped ONCE, reused per step
    key = jax.device_put(jax.random.PRNGKey(0))

    state, loss, _ = step_fn(state, batch, key)   # compile
    float(loss)                                    # host sync
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, _ = step_fn(state, batch, key)
    f = float(loss)                                # one sync for the chain
    dt = (time.perf_counter() - t0) / steps
    hbm = device_memory_stats()[0]
    return {
        "bsz": bsz,
        "step_ms": round(1000 * dt, 2),
        "segments_per_sec": round(bsz / dt, 1),
        "loss_finite": bool(np.isfinite(f)),
        "hbm_in_use_gib": (round(hbm["bytes_in_use"] / 2**30, 2)
                           if hbm.get("bytes_in_use") else None),
        "hbm_limit_gib": (round(hbm["bytes_limit"] / 2**30, 2)
                          if hbm.get("bytes_limit") else None),
        "backend": jax.default_backend(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="tpu_5120")
    ap.add_argument("--bsz", type=int, default=None,
                    help="override BSZ.TR_BATCH_SZ (default: the preset's)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--probe", action="store_true",
                    help="halve the batch until the step fits; report the "
                         "largest working size")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nafp_tpu.configuration import load_config
    cfg = load_config(args.config)
    bsz = args.bsz or int(cfg["BSZ"]["TR_BATCH_SZ"])
    while True:
        try:
            row = measure(cfg, bsz, args.steps)
            print(json.dumps(row), flush=True)
            return
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            if not args.probe or bsz <= 16:
                raise
            print(json.dumps({"bsz": bsz, "error": msg}), flush=True)
            bsz //= 2


if __name__ == "__main__":
    main()
