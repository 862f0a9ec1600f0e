"""Device memory statistics + host memory helpers.

Replaces the reference's CUDA memory tooling (finetune/utils/memory_utils.py:
get_memory_statistics / free_memory / torch.cuda peak counters) with the JAX
equivalents: per-device memory_stats() where the backend reports them, live
buffer accounting as the portable fallback.
"""

from __future__ import annotations

import gc
from typing import Any

import jax


def get_memory_statistics(device=None) -> dict[str, Any]:
    """Bytes in use / peak / limit for one device (None = default)."""
    device = device or jax.devices()[0]
    stats = {}
    try:
        raw = device.memory_stats() or {}
        stats = {
            "bytes_in_use": raw.get("bytes_in_use"),
            "peak_bytes_in_use": raw.get("peak_bytes_in_use"),
            "bytes_limit": raw.get("bytes_limit"),
        }
    except Exception:
        pass
    if not stats.get("bytes_in_use"):
        live = [
            b for b in jax.live_arrays() if device in getattr(b, "devices", lambda: [])()
        ]
        stats["bytes_in_use"] = sum(b.nbytes for b in live)
    return {"device": str(device), **stats}


def free_memory() -> None:
    """Drop python references and ask the backend to release buffers."""
    gc.collect()
    try:
        jax.clear_caches()
    except Exception:
        pass


def log_all_devices() -> list[dict[str, Any]]:
    return [get_memory_statistics(d) for d in jax.devices()]
