#!/usr/bin/env python
"""Offline synthesis of fixed augmented query WAVs.

Counterpart of the reference ``extras/dataset2wav.py:47-121`` — the tool
that produced the shipped ``test-query-db-500-30s`` queries. It runs the
validation-source segments through the replica pipeline with
*deterministic* evenly-spread offsets (experimental_mode) and the
time-domain augmentation chain, then writes each augmented segment as a
16-bit PCM WAV.

Usage:
    PYTHONPATH=. python extras/dataset2wav.py OUT_DIR [-c CONFIG]
                 [--split val|test] [--n_pos 1]
"""
import os
import sys
import wave

import click
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@click.command()
@click.argument("out_dir", required=True)
@click.option("--config", "-c", default="default")
@click.option("--split", default="val", type=click.Choice(["val", "test"]))
@click.option("--n_pos", default=1, type=click.INT,
              help="Augmented versions per segment.")
@click.option("--seed", default=42, type=click.INT)
def main(out_dir, config, split, n_pos, seed):
    import jax
    import jax.numpy as jnp
    from nafp_tpu.configuration import load_config
    from nafp_tpu.data.catalog import Dataset, _glob_wavs
    from nafp_tpu.data.loader import SegmentLoader, prefetch
    from nafp_tpu.ops.tdaug import MAX_IR_LENGTH, augment_replicas

    cfg = load_config(config)
    ds = Dataset(cfg)
    if split == "val":
        fps = _glob_wavs(ds.source_root_dir, "val-query-db-500-30s/**/*.wav")
        bg, ir = ds.val_bg_fps, ds.val_ir_fps
        snr = tuple(ds.val_snr)
    else:
        fps = _glob_wavs(ds.source_root_dir,
                         "test-query-db-500-30s/db/**/*.wav")
        bg, ir = ds.ts_bg_fps, ds.ts_ir_fps
        snr = tuple(ds.ts_snr)

    bsz = ds.ts_batch_sz * (1 + n_pos)
    loader = SegmentLoader(
        fps, bsz=bsz, n_anchor=ds.ts_batch_sz, duration=ds.dur, hop=ds.hop,
        fs=ds.fs, shuffle=False, random_offset_anchor=False,
        bg_fps=bg, ir_fps=ir, experimental_mode=True,
        reduce_batch_first_half=True, drop_the_last_non_full_batch=False,
        seed=seed)

    aug = jax.jit(lambda xp, b, i, k: augment_replicas(
        xp, b, i, k, snr, use_bg=bool(bg), use_ir=bool(ir)))

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for bi, batch in enumerate(prefetch(loader)):
        xp = jnp.asarray(batch["replicas"])
        xq = np.asarray(aug(
            xp,
            jnp.asarray(batch["bg"]) if "bg" in batch else jnp.zeros_like(xp),
            jnp.asarray(batch["ir"]) if "ir" in batch
            else jnp.zeros((xp.shape[0], MAX_IR_LENGTH), jnp.float32),
            jax.random.PRNGKey(seed + bi)))
        n_valid = int(batch["n_valid"]) * max(1, loader.n_pos_per_anchor)
        for i in range(n_valid):
            path = os.path.join(out_dir, f"{n:06d}.wav")
            pcm = (np.clip(xq[i], -1, 1) * 32767).astype(np.int16)
            with wave.open(path, "w") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(ds.fs)
                w.writeframes(pcm.tobytes())
            n += 1
    print(f"wrote {n} augmented query WAVs to {out_dir}")


if __name__ == "__main__":
    main()
