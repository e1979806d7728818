"""Driver entry points: compile-check entry() and run dryrun_multichip."""
import importlib.util
import os

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


def test_entry_traces():
    mod = _load_entry_module()
    fn, args = mod.entry()
    # trace without executing the full-size model on the slow CPU
    out = jax.eval_shape(fn, *args)
    assert out.shape == (8, 128)
    assert out.dtype == jnp.float32
