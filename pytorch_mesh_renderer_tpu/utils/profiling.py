"""Profiling and throughput measurement.

The reference has no tracing/profiling at all (SURVEY.md §5 — only ad-hoc
prints in the kernels). TPU-native replacement: `jax.profiler` traces
viewable in XProf/TensorBoard, plus a small steady-state throughput harness
(the machinery behind bench.py).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Captures a jax.profiler trace for the enclosed block.

    View with `tensorboard --logdir <log_dir>` (or XProf). Example:

        with profiling.trace("/tmp/render_trace"):
            images = render_fn(scene).block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def measure_throughput(fn, *args, iters: int = 20, warmup: int = 2,
                       items_per_call: int = 1):
    """Steady-state throughput of a jitted callable.

    Runs `warmup` untimed calls (compile + cache warm), then times `iters`
    calls with a trailing block_until_ready. Returns (items_per_sec,
    seconds_per_call).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - start) / iters
    return items_per_call / dt, dt
