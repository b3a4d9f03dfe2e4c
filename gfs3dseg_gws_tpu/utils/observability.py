"""Observability: scalar metrics sink + profiler hooks.

The reference logs scalars to TensorBoard (train.py:657-662) and has no
tracing. Here scalars always land in an append-only `metrics.jsonl` (easy to
diff/plot, no deps) with TensorBoard mirroring when torch's SummaryWriter is
importable, and `trace()` wraps `jax.profiler` for on-demand device traces.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class MetricsWriter:
    """Append-only JSONL scalar sink + optional TensorBoard mirror."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step),
                                  "time": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler device trace around a code block.

    Usage: with trace("/tmp/trace"): run_steps(). View with TensorBoard or
    Perfetto. No-op when log_dir is falsy.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt

    @property
    def mean(self) -> float:
        steps = max(self.count - self.warmup, 1)
        return self.total / steps
