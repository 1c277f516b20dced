"""Tracing/profiling utilities — the TPU-native observability layer.

The reference has no first-party tracing (SURVEY.md §5.1 — only
TensorBoard scalars and an unused py3nvml dep); here profiling is a
first-class tool: jax.profiler device traces (viewable in TensorBoard /
Perfetto), XLA HLO dumps for kernel inspection, and a step timer that
separates compile time from steady-state time (the first call through a
jitted function compiles).
"""
from __future__ import annotations

import contextlib
import os
import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional


@contextlib.contextmanager
def trace(logdir: str | Path) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``logdir``."""
    import jax

    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_hlo_dump(dump_dir: str | Path) -> None:
    """Route XLA HLO dumps to ``dump_dir`` (must run before first compile)."""
    Path(dump_dir).mkdir(parents=True, exist_ok=True)
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = f"{flags} --xla_dump_to={dump_dir}".strip()


class StepTimer:
    """Wall-clock step timer distinguishing compile (first call) from
    steady state; blocks on results for honest device timing."""

    def __init__(self):
        self.compile_time: Optional[float] = None
        self.times: List[float] = []

    def measure(self, fn, *args, warmup: int = 1, iters: int = 5, **kw) -> Dict[str, float]:
        import jax

        self.times = []  # fresh stats per measured fn (timers get reused)
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        self.compile_time = time.perf_counter() - t0
        for _ in range(max(warmup - 1, 0)):
            jax.block_until_ready(fn(*args, **kw))
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args, **kw))
            self.times.append(time.perf_counter() - t0)
        ts = sorted(self.times)
        return {
            "compile_s": self.compile_time,
            "median_s": ts[len(ts) // 2],
            "best_s": ts[0],
        }


def memory_stats() -> Dict[str, float]:
    """Per-device memory stats (bytes) where the backend reports them."""
    import jax

    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
    return out
