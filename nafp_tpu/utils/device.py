"""Device memory / platform introspection.

TPU-native counterpart of the reference's GPU memory-limit helper
(``model/utils/config_gpu_memory_lim.py:5-28``). TPUs have no
set_memory_growth knob; what production users need instead is visibility
(HBM usage per device) and an escape hatch for host-platform sizing.
"""
from __future__ import annotations

from typing import Dict, List

import jax


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


def print_device_summary() -> None:
    for s in device_memory_stats():
        used = s["bytes_in_use"]
        lim = s["bytes_limit"]
        mem = (f"{used / 2**30:.2f}/{lim / 2**30:.2f} GiB"
               if used is not None and lim else "n/a")
        print(f"device {s['id']}: {s['kind']} ({s['platform']}) mem {mem}")
