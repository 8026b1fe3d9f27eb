"""Profiling / tracing hooks.

The TPU upgrade of the reference's minimal timing (SURVEY.md §5: the
reference wraps cuda.synchronize + time.time around eval loops): a
jax.profiler trace context producing XPlane/perfetto traces, plus a
block-timing helper that measures a jitted step by materializing its
output (block_until_ready alone is unreliable on tunneled platforms — see
.claude/skills/verify/SKILL.md).
"""

import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["trace", "time_step"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view in XProf / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_step(fn, *args, iters: int = 10, warmup: int = 2):
    """Wall-time a jitted step, forcing materialization each call.

    Returns seconds per call (median).
    """
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args)
        # force completion: pull one scalar to host
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
