#!/usr/bin/env python
"""Headline benchmark: fingerprinting throughput (1-s segments/sec/chip).

North-star target from BASELINE.md: >= 10,000 1-s segments/sec/chip for the
full melspec + FingerPrinter inference path. Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/10000}

Measures the pure device pipeline (waveform -> log-mel -> encoder -> 128-d
fingerprint) with device-resident inputs, no host syncs inside the timed
window — host IO is the loader's job and benchmarked separately.
"""
import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
import jax.numpy as jnp

BASELINE_SEGS_PER_SEC = 10_000.0  # BASELINE.md north-star
BATCH = 1024  # sweep: 512->53k, 1024->57k, 2048->44k segs/s
ITERS = 20

# Dense peak bf16 TFLOP/s per chip, by jax device_kind (MXU throughput;
# used only for the diagnostic MFU field so regressions are visible).
PEAK_BF16_TFLOPS = {
    "TPU v3": 123.0,
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v5": 459.0,        # v5p
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,   # v6e / Trillium
    "TPU v6e": 918.0,
}


def _flops_per_call(jitted, *args) -> float:
    """FLOPs of one compiled call from XLA cost analysis (0.0 if the
    backend doesn't expose it, e.g. some plugin runtimes)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main() -> None:
    from nafp_tpu.configuration import load_config
    from nafp_tpu.models.nnfp import get_fingerprinter
    from nafp_tpu.ops.melspec import get_melspec_fn
    from nafp_tpu.train.trainer import init_params

    cfg = load_config("default")
    melspec_fn, mcfg = get_melspec_fn(cfg)
    model = get_fingerprinter(cfg)  # full 19M-param encoder, bf16 compute
    params = init_params(cfg, model, mcfg)

    @jax.jit
    def fingerprint(p, x):
        return model.apply(p, melspec_fn(x), train=False)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, mcfg.n_samples), jnp.float32)
    x = jax.device_put(x)

    # Warmup / compile; full host sync (block_until_ready alone has proven
    # unreliable through the remote-TPU tunnel on cold runs).
    import numpy as np
    np.asarray(fingerprint(params, x))
    np.asarray(fingerprint(params, x))

    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fingerprint(params, x)
    np.asarray(out)  # end-to-end sync (copies BATCHx128 floats, negligible)
    dt = time.perf_counter() - t0

    segs_per_sec = BATCH * ITERS / dt

    line = {
        "metric": "fingerprint_throughput",
        "value": round(segs_per_sec, 1),
        "unit": "segments/sec/chip",
        "vs_baseline": round(segs_per_sec / BASELINE_SEGS_PER_SEC, 3),
    }
    # Diagnostic MFU: achieved FLOP/s over the chip's dense bf16 peak.
    flops = _flops_per_call(fingerprint, params, x)
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_TFLOPS.get(kind)
    if flops and peak:
        achieved_tflops = flops * ITERS / dt / 1e12
        line["mfu"] = round(achieved_tflops / peak, 4)
        line["tflops"] = round(achieved_tflops, 1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
