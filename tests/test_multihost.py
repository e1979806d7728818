"""Multi-host data parallelism, exercised for real: two OS processes join
a jax.distributed cluster on the CPU backend (4 forced devices each -> an
8-device global mesh), shard the song list per process, assemble global
batches from process-local data, and run the sharded NT-Xent train step.

This is the path `parallel/mesh.py` documents for pod-scale runs; a v4-8
is one host, so this CPU-backend run is the only way to execute the
distributed runtime on this machine (one real TPU chip). The reference
never had even single-host DP wired (SURVEY.md §2).
"""
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["NAFP_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from nafp_tpu.parallel.mesh import (make_data_mesh, maybe_init_distributed,
                                    process_shard)
assert maybe_init_distributed(None), "env vars must trigger init"
assert maybe_init_distributed(None), "second call must be a no-op"
assert jax.process_count() == 2
assert jax.device_count() == 8 and len(jax.local_devices()) == 4

shard = process_shard([f"song{i}" for i in range(10)])
print("SHARD", ",".join(shard), flush=True)

import jax.numpy as jnp
import numpy as np
from nafp_tpu.configuration import load_config
from nafp_tpu.models import nnfp
from nafp_tpu.ops.melspec import get_melspec_fn
from nafp_tpu.ops.specaug import get_specaug_fn
from nafp_tpu.optim.schedules import build_optimizer
from nafp_tpu.train import trainer as T

cfg = load_config("default")
cfg["BSZ"].update(TR_BATCH_SZ=16, TR_N_ANCHOR=8)
cfg["SPEC_AUG"]["SPECAUG_CHAIN"] = []
melspec_fn, mcfg = get_melspec_fn(cfg)
specaug_fn = get_specaug_fn(cfg)
model = nnfp.FingerPrinter(norm="layer_norm2d", dtype=jnp.float32,
                           emb_sz=16,
                           front_hidden_ch=(8, 8, 16, 16, 32, 32, 64, 64))
opt = build_optimizer(cfg, 10)
params = T.init_params(cfg, model, mcfg)   # same seed -> identical on both
state = T.TrainState(params, opt.init({"params": params["params"]}),
                     jnp.zeros([], jnp.int32))
mesh = make_data_mesh()
assert mesh.size == 8
state = T._replicate(state, mesh)
step = T.make_train_step(cfg, melspec_fn, specaug_fn, model, opt, mesh,
                         aug_keys=frozenset())

pid = jax.process_index()
rng = np.random.default_rng(100 + pid)    # DISJOINT data per host
batch = {
    "anchors": (0.1 * rng.standard_normal((4, 8000))).astype(np.float32),
    "replicas": (0.1 * rng.standard_normal((4, 8000))).astype(np.float32),
}
db = T._device_batch(batch, mesh)
assert db["anchors"].shape == (8, 8000), db["anchors"].shape  # global batch
k0 = T._replicate(jax.random.PRNGKey(0), mesh)
k1 = T._replicate(jax.random.PRNGKey(1), mesh)
state, l0, _ = step(state, db, k0)
state, l1, _ = step(state, db, k1)
leaf = jax.tree_util.tree_leaves(state.params)[0]
print(f"LOSS {float(l0):.10f} {float(l1):.10f}", flush=True)
print(f"CKSUM {float(jnp.sum(jnp.abs(leaf))):.10f}", flush=True)
"""


def test_two_process_distributed_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            NAFP_REPO=REPO,
            NAFP_COORDINATOR=f"localhost:{port}",
            NAFP_NUM_PROCESSES="2",
            NAFP_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    def grab(out, tag):
        lines = [ln for ln in out.splitlines() if ln.startswith(tag + " ")]
        assert lines, f"{tag} line missing:\n{out}"
        return lines[0].split(" ", 1)[1]

    # round-robin song shards are disjoint and cover the list
    s0 = grab(outs[0], "SHARD").split(",")
    s1 = grab(outs[1], "SHARD").split(",")
    assert s0 == [f"song{i}" for i in range(0, 10, 2)]
    assert s1 == [f"song{i}" for i in range(1, 10, 2)]

    # the global computation must agree exactly across processes: same
    # losses (fully-replicated outputs) and bit-identical updated params
    l0 = [float(x) for x in grab(outs[0], "LOSS").split()]
    l1 = [float(x) for x in grab(outs[1], "LOSS").split()]
    np.testing.assert_array_equal(l0, l1)
    assert np.isfinite(l0).all()
    assert grab(outs[0], "CKSUM") == grab(outs[1], "CKSUM")
