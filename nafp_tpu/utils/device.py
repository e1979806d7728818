"""Device memory / platform introspection.

TPU-native counterpart of the reference's GPU memory-limit helper
(``model/utils/config_gpu_memory_lim.py:5-28``). TPUs have no
set_memory_growth knob; what production users need instead is visibility
(HBM usage per device) and an escape hatch for host-platform sizing.
"""
from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_rows(buf: jax.Array, blk: jax.Array, start: jax.Array):
    return jax.lax.dynamic_update_slice_in_dim(buf, blk, start, axis=0)


def chunked_device_put(arr: np.ndarray,
                       chunk_bytes: int = 128 << 20) -> jax.Array:
    """Device-put a large host array in bounded-size row chunks.

    One donated dynamic-update executable handles every full block (plus
    one for the tail shape), so peak transfer-buffer use stays at
    ``chunk_bytes`` regardless of array size — required for multi-GB
    stores through links with bounded transfer buffers."""
    nbytes = arr.size * arr.itemsize
    if nbytes <= chunk_bytes:
        return jnp.asarray(arr)
    rows = max(1, chunk_bytes // max(1, arr[0:1].size * arr.itemsize))
    buf = jnp.zeros(arr.shape, arr.dtype)
    nfull = (len(arr) // rows) * rows
    for s in range(0, nfull, rows):           # one executable (full blocks)
        buf = _update_rows(buf, jnp.asarray(np.ascontiguousarray(
            arr[s:s + rows])), jnp.asarray(s, jnp.int32))
    if nfull < len(arr):                      # one more for the tail shape
        buf = _update_rows(buf, jnp.asarray(np.ascontiguousarray(
            arr[nfull:])), jnp.asarray(nfull, jnp.int32))
    return buf


def device_memory_stats() -> List[Dict]:
    """Per-device memory stats (bytes_in_use / bytes_limit where the
    backend reports them)."""
    out = []
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        out.append({
            "id": d.id,
            "platform": d.platform,
            "kind": getattr(d, "device_kind", "?"),
            "bytes_in_use": stats.get("bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        })
    return out


def device_recon_budget(fallback: int = 4 << 30, frac: float = 0.5,
                        stats: Dict = None) -> int:
    """Bytes it is safe to spend on the eval's device-resident recon array
    (``search/evaluate.py``): ``frac`` of device 0's free HBM
    (limit − in_use) when the backend reports memory stats, else the
    ``fallback`` constant. ``frac`` defaults to half so the index store,
    decode transients and search blocks keep the other half — the exact
    collision the old fixed 4 GiB constant could not see (a 4 GiB recon +
    an int8 store + transients can overrun 16 GB HBM when the index is
    also device-resident). ``stats`` injects a fake record for tests."""
    s = stats if stats is not None else device_memory_stats()[0]
    used, lim = s.get("bytes_in_use"), s.get("bytes_limit")
    if used is None or not lim:
        return fallback
    return max(0, int((lim - used) * frac))


def print_device_summary() -> None:
    for s in device_memory_stats():
        used = s["bytes_in_use"]
        lim = s["bytes_limit"]
        mem = (f"{used / 2**30:.2f}/{lim / 2**30:.2f} GiB"
               if used is not None and lim else "n/a")
        print(f"device {s['id']}: {s['kind']} ({s['platform']}) mem {mem}")
