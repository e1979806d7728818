"""Fingerprint generation: stream datasets through m_fp(m_pre(x)) to memmaps.

Counterpart of reference ``model/generate.py:91-194``. Artifacts use the
identical on-disk contract — ``{dummy_db,db,query,custom_source}.mm``
float32 (n_items, d) + ``{key}_shape.npy`` under
``OUTPUT_ROOT_DIR/CHECKPOINT_NAME/CHECKPOINT_INDEX/`` — so downstream
evaluation (ours or the reference's) reads either's output.

TPU notes: the whole melspec+encoder pass is one jitted function; batches
are static-shaped (the loader zero-pads the final batch and reports
``n_valid``, so there is exactly one compilation). For 'unseen_syn' query
synthesis the time-domain augmentation runs on-device before
fingerprinting, replacing the reference's CPU-side doubled-batch trick
(``dataset.py:268-303``).

On a multi-chip mesh the fingerprint pass is sharded over ``('data',)``
like the train step (reference ``model/generate.py:170-180`` ran its pass
on one GPU): params replicated, batch rows split across chips, rows padded
up to a mesh multiple host-side (the pad rows land past ``n_valid`` so the
memmap write never sees them). Verified memmap-equal to the single-device
pass in ``__graft_entry__.dryrun_multichip`` and
``tests/test_sharded_search.py``.
"""
from __future__ import annotations

import functools
import os
import sys
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nafp_tpu.data.audio_io import create_memmap
from nafp_tpu.data.catalog import Dataset
from nafp_tpu.data.loader import prefetch
from nafp_tpu.models.nnfp import get_fingerprinter
from nafp_tpu.ops.melspec import get_melspec_fn
from nafp_tpu.ops.tdaug import MAX_IR_LENGTH, augment_replicas
from nafp_tpu.train.experiment import ExperimentHelper



def load_params(cfg: Dict[str, Any], checkpoint_name: str,
                checkpoint_index: Optional[int], model, mcfg):
    """Restore trained params (latest checkpoint when index is None;
    reference generate.py:26-52)."""
    helper = ExperimentHelper(checkpoint_name, cfg)
    if checkpoint_index is None:
        latest = helper.latest_epoch()
        if latest is None:
            raise FileNotFoundError(
                f"no checkpoint found in {helper.ckpt_dir}")
        checkpoint_index = latest
        print(f"[generate] using latest checkpoint index {latest}")
    # Restore as saved (no template needed — we only take params).
    restored = helper.manager.restore(int(checkpoint_index))
    helper.close()
    params = jax.tree.map(jnp.asarray, restored["params"])
    del mcfg, model  # signature kept for template-based restores
    return params, int(checkpoint_index)


def prevent_overwrite(key: str, target_path: str) -> None:
    """Interactive guard for the expensive dummy-db pass
    (reference generate.py:55-58)."""
    if key == "dummy_db" and os.path.exists(target_path):
        answer = input(f"{target_path} exists. Will you overwrite (y/N)? ")
        if answer.lower() not in ("y", "yes"):
            sys.exit()


def get_data_source(cfg, dataset: Dataset, source_root_dir, skip_dummy):
    ds = {}
    if source_root_dir:
        ds["custom_source"] = dataset.get_custom_db_ds(source_root_dir)
    else:
        if skip_dummy:
            print("Excluding 'dummy_db' from source.")
        else:
            ds["dummy_db"] = dataset.get_test_dummy_db_ds()
        ds["query"], ds["db"] = dataset.get_test_query_db_ds()
    print(f"Data source: {list(ds.keys())} ({dataset.datasel_test_query_db})")
    return ds


def generate_fingerprint(cfg: Dict[str, Any],
                         checkpoint_name: str,
                         checkpoint_index: Optional[int] = None,
                         source_root_dir: Optional[str] = None,
                         output_root_dir: Optional[str] = None,
                         skip_dummy: bool = False,
                         assume_yes: bool = False) -> str:
    melspec_fn, mcfg = get_melspec_fn(cfg)
    model = get_fingerprinter(cfg)
    params, checkpoint_index = load_params(cfg, checkpoint_name,
                                           checkpoint_index, model, mcfg)

    dataset = Dataset(cfg)
    ds = get_data_source(cfg, dataset, source_root_dir, skip_dummy)
    # DEVICE.DEVICE_CORPUS: make each source resident in HBM and gather
    # segments on device — inference batches then cost O(1) link bytes
    # (see data/device_corpus.py). Oversized sources (e.g. a true 100k-song
    # dummy-db) fall back to host streaming per the configured budget.
    from nafp_tpu.data.device_corpus import maybe_device_loader
    ds = {k: maybe_device_loader(v, cfg, label=k) for k, v in ds.items()}

    out_root = output_root_dir or cfg["DIR"]["OUTPUT_ROOT_DIR"]
    out_dir = os.path.join(out_root, checkpoint_name, str(checkpoint_index))
    os.makedirs(out_dir, exist_ok=True)
    if not skip_dummy and not source_root_dir and not assume_yes:
        prevent_overwrite("dummy_db", os.path.join(out_dir, "dummy_db.mm"))

    from nafp_tpu.parallel.mesh import (batch_sharding, mesh_from_cfg,
                                        replicated_sharding)
    mesh = mesh_from_cfg(cfg)
    nd = mesh.size
    rep, shd = replicated_sharding(mesh), batch_sharding(mesh)
    if nd > 1:
        print(f"[generate] sharding fingerprint pass over {nd} devices")
        params = jax.device_put(params, rep)

    def _pad_rows(x):
        """Pad batch rows up to a mesh multiple (host-side, static per
        loader so there is still exactly one compilation)."""
        r = (-np.shape(x)[0]) % nd
        if not r:
            return jnp.asarray(x)
        return jnp.concatenate(
            [jnp.asarray(x),
             jnp.zeros((r,) + np.shape(x)[1:], jnp.asarray(x).dtype)])

    @functools.partial(jax.jit, in_shardings=(rep, shd), out_shardings=shd)
    def fp_step(p, x):
        return model.apply(p, melspec_fn(x), train=False)

    snr = tuple(cfg["TD_AUG"]["TS_SNR"])
    use_bg = bool(cfg["TD_AUG"]["TS_BG_AUG"])
    use_ir = bool(cfg["TD_AUG"]["TS_IR_AUG"])

    @functools.partial(jax.jit, in_shardings=(rep, shd, shd, shd, rep),
                       out_shardings=shd)
    def fp_step_syn(p, replicas, bg, ir, key):
        xq = augment_replicas(replicas, bg, ir, key, snr,
                              use_bg=use_bg, use_ir=use_ir)
        return model.apply(p, melspec_fn(xq), train=False)

    dim = int(cfg["MODEL"]["EMB_SZ"])
    sz_check = {}
    for key, loader in ds.items():
        synth = loader.reduce_batch_first_half  # 'unseen_syn' query loader
        n_items = (loader.n_samples * max(1, loader.n_pos_per_anchor)
                   if synth else loader.n_samples)
        assert n_items > 0
        arr = create_memmap(out_dir, key, (n_items, dim))
        print(f"=== Generating fingerprint from '{key}' "
              f"bsz={loader.bsz}, {n_items} items, d={dim} ===")
        row = 0
        for i, batch in enumerate(prefetch(loader)):
            if synth:
                n_rep = np.shape(batch["replicas"])[0]
                emb = fp_step_syn(params, _pad_rows(batch["replicas"]),
                                  _pad_rows(batch["bg"]) if "bg" in batch
                                  else _pad_rows(jnp.zeros_like(
                                      jnp.asarray(batch["replicas"]))),
                                  _pad_rows(batch["ir"]) if "ir" in batch
                                  else _pad_rows(jnp.zeros(
                                      (n_rep, MAX_IR_LENGTH), jnp.float32)),
                                  jax.random.PRNGKey(i))
                n_valid = int(batch["n_valid"]) * max(1, loader.n_pos_per_anchor)
            else:
                emb = fp_step(params, _pad_rows(batch["anchors"]))
                n_valid = int(batch["n_valid"])
            arr[row:row + n_valid] = np.asarray(emb[:n_valid], np.float32)
            row += n_valid
        arr.flush()
        del arr
        print(f"=== Stored {n_items} fingerprints to {out_dir} ===")
        sz_check[key] = n_items

    if "db" in sz_check and sz_check["db"] != sz_check.get("query"):
        print("Warning: 'db' and 'query' sizes differ; evaluation may break.")
    return out_dir
