"""Accelerator info and memory tracking.

TPU-native equivalent of the reference's nvidia-smi based utilities
(``/root/reference/src/fluidgym/simulation/pict/util/GPU_info.py:49-152``,
``memory_usage.py:20-57``): device enumeration and live/peak HBM usage via
jax's memory-stats API.
"""

from __future__ import annotations

import jax

__all__ = ["get_device_info", "get_available_device", "MemoryUsage"]


def get_device_info() -> list[dict]:
    """One dict per accelerator: platform, kind, id, memory stats (bytes)."""
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
            "device_kind": getattr(d, "device_kind", "unknown"),
            "bytes_in_use": stats.get("bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        })
    return out


def get_available_device(min_free_bytes: int = 0):
    """The device with the most free memory (reference getAvailableGPU)."""
    best, best_free = None, -1
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
            free = (stats.get("bytes_limit") or 0) - (stats.get("bytes_in_use") or 0)
        except Exception:
            free = 0
        if free > best_free:
            best, best_free = d, free
    if best is None or best_free < min_free_bytes:
        raise RuntimeError("no device with enough free memory")
    return best


class MemoryUsage:
    """Track live/peak device memory deltas around a code region
    (reference MemoryUsage, memory_usage.py:20-57)."""

    def __init__(self, device=None):
        self.device = device or jax.devices()[0]
        self._start = None

    def _stats(self) -> dict:
        try:
            return self.device.memory_stats() or {}
        except Exception:
            return {}

    def start(self) -> None:
        self._start = self._stats().get("bytes_in_use", 0)

    def current(self) -> int:
        return self._stats().get("bytes_in_use", 0)

    def peak(self) -> int:
        return self._stats().get("peak_bytes_in_use", 0)

    def delta(self) -> int:
        if self._start is None:
            raise RuntimeError("call start() first")
        return self.current() - self._start

    def __enter__(self) -> "MemoryUsage":
        self.start()
        return self

    def __exit__(self, *exc) -> bool:
        return False
