"""Driver entry points: compile-check entry() and run dryrun_multichip."""
import importlib.util
import os
import subprocess
import sys

import jax
import jax.numpy as jnp


def _load_entry_module():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_8_devices():
    mod = _load_entry_module()
    mod.dryrun_multichip(8)  # asserts finite loss internally


def test_dryrun_driver_call_pattern():
    """Reproduce the driver's exact invocation: fresh interpreter, harness
    env intact (TPU plugin as default platform, no XLA_FLAGS, no conftest).
    dryrun_multichip must force its own virtual CPU mesh (round-1 failure:
    it only did so under __main__, so the driver's direct call initialized
    the TPU backend and died)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"  # what the harness bakes
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "ok, loss=" in r.stdout


def test_entry_traces():
    mod = _load_entry_module()
    fn, args = mod.entry()
    # trace without executing the full-size model on the slow CPU
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8, 128)
    assert out.dtype == jnp.float32
