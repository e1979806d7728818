#!/usr/bin/env python
"""Measure the quantized-activation inference path vs the bf16 baseline.

The encoder is HBM-bound (models/nnfp.py LayerNorm2d PERF NOTE: bsz-1024
inference = 16.7 ms ~= 14 GB of bf16 activation traffic at v5e's
819 GB/s). ``MODEL.ACT_STORE`` stores inter-layer activations at
1 byte/elem (int8 fixed-scale or float8_e4m3fn), halving that bound IF
XLA fuses the convert/rescale into the convolution's operand read —
which only a measurement can confirm (two previous traffic "wins" lost
to XLA's schedule and were reverted).

Prints one JSON line per mode {None, int8, fp8} with segs/sec and the
cosine similarity of the quantized embeddings against the bf16 path
(the accuracy gate for using ACT_STORE in `generate`).
"""
import json
import os
import sys
import time

# `python extras/bench_quant.py` puts extras/ (not the repo) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp
import numpy as np

BATCH = 1024
ITERS = 20


def main() -> None:
    from nafp_tpu.configuration import load_config
    from nafp_tpu.models.nnfp import get_fingerprinter
    from nafp_tpu.ops.melspec import get_melspec_fn
    from nafp_tpu.train.trainer import init_params

    cfg = load_config("default")
    melspec_fn, mcfg = get_melspec_fn(cfg)
    model = get_fingerprinter(cfg)
    params = init_params(cfg, model, mcfg)

    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, mcfg.n_samples),
                          jnp.float32)
    x = jax.device_put(x)

    ref_emb = None
    for mode in (None, "int8", "fp8"):
        cfg["MODEL"]["ACT_STORE"] = mode
        m = get_fingerprinter(cfg)

        @jax.jit
        def fp(p, a, m=m):
            return m.apply(p, melspec_fn(a), train=False)

        emb = np.asarray(fp(params, x))   # compile + warmup
        np.asarray(fp(params, x))
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fp(params, x)
        np.asarray(out)
        dt = time.perf_counter() - t0
        line = {"act_store": mode or "bf16",
                "segs_per_sec": round(BATCH * ITERS / dt, 1),
                "ms_per_batch": round(1e3 * dt / ITERS, 2)}
        if ref_emb is None:
            ref_emb = emb
        else:
            cos = np.sum(ref_emb * emb, axis=1)
            line["cos_vs_bf16_min"] = round(float(cos.min()), 4)
            line["cos_vs_bf16_mean"] = round(float(cos.mean()), 4)
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
