"""Hierarchical wall-clock profiler.

Re-expression of the reference profiler
(``/root/reference/src/fluidgym/simulation/pict/util/profiling.py:48-497``):
nested ``SAMPLE("name")`` context managers building a tree of timing nodes
with streaming (Welford) statistics, a ``stats()`` report, and JSON
save/load.  On TPU the heavy per-op timing belongs to ``jax.profiler`` traces
(use :func:`trace` for that); this host-side sampler times env-level phases.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from pathlib import Path

__all__ = ["Profiler", "SAMPLE", "trace"]


@dataclass
class _Node:
    name: str
    count: int = 0
    total: float = 0.0
    mean: float = 0.0
    m2: float = 0.0
    min: float = float("inf")
    max: float = 0.0
    children: dict = field(default_factory=dict)

    def add(self, dt: float) -> None:
        self.count += 1
        self.total += dt
        delta = dt - self.mean
        self.mean += delta / self.count
        self.m2 += delta * (dt - self.mean)
        self.min = min(self.min, dt)
        self.max = max(self.max, dt)

    @property
    def var(self) -> float:
        return self.m2 / self.count if self.count > 1 else 0.0

    def to_dict(self) -> dict:
        return {
            "count": self.count, "total": self.total, "mean": self.mean,
            "var": self.var, "min": self.min, "max": self.max,
            "children": {k: v.to_dict() for k, v in self.children.items()},
        }


class Profiler:
    """Nested wall-clock sampler with streaming statistics."""

    def __init__(self) -> None:
        self.root = _Node("root")
        self._stack: list[_Node] = [self.root]
        self.enabled = False

    def enable(self) -> None:
        self.enabled = True

    def disable(self) -> None:
        self.enabled = False

    def reset(self) -> None:
        self.root = _Node("root")
        self._stack = [self.root]

    @contextlib.contextmanager
    def __call__(self, name: str, block_until_ready=None):
        """Time a scope.  Pass a jax array as ``block_until_ready`` to include
        device completion in the measurement."""
        if not self.enabled:
            yield
            return
        parent = self._stack[-1]
        node = parent.children.setdefault(name, _Node(name))
        self._stack.append(node)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_until_ready is not None:
                import jax

                jax.block_until_ready(block_until_ready)
            node.add(time.perf_counter() - t0)
            self._stack.pop()

    def stats(self) -> str:
        """Human-readable report of the timing tree."""
        lines: list[str] = []

        def rec(node: _Node, depth: int) -> None:
            if depth > 0:
                lines.append(
                    f"{'  ' * depth}{node.name}: n={node.count} "
                    f"total={node.total:.4f}s mean={node.mean * 1e3:.3f}ms "
                    f"min={node.min * 1e3:.3f}ms max={node.max * 1e3:.3f}ms"
                )
            for child in node.children.values():
                rec(child, depth + 1)

        rec(self.root, 0)
        return "\n".join(lines)

    def save(self, path: str | Path) -> None:
        with open(path, "w") as fh:
            json.dump(self.root.to_dict(), fh, indent=1)


# global sampler, mirroring the reference's module-level SAMPLE (profiling.py:497)
SAMPLE = Profiler()


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Device-level profiling via jax.profiler (TPU trace viewer)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
