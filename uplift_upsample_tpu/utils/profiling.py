"""Profiling and step-timing utilities.

The reference only logs wall-clock step durations (`train.py:552-572`). Here:
  - `trace(logdir)`: context manager around jax.profiler.trace — produces a
    TensorBoard-loadable device trace (op-level timeline) when the platform
    supports it.
  - `StepTimer`: wall-clock step statistics with ETA formatting.
  - `device_timer`: robust device-time measurement that survives PJRT
    backends where `block_until_ready` doesn't synchronize (seen with
    relay-tunneled TPUs): run the op M1 and M2 times inside one jitted
    lax.scan with a chained carry and take the slope.
"""

from __future__ import annotations

import contextlib
import time
from functools import partial

import jax
import jax.numpy as jnp

from .time_format import format_time


@contextlib.contextmanager
def trace(logdir: str):
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover - platform dependent
        print(f"profiler trace unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, total_steps: int):
        self.total_steps = total_steps
        self.start = time.time()
        self.completed = 0

    def step(self) -> None:
        self.completed += 1

    @property
    def elapsed(self) -> float:
        return time.time() - self.start

    @property
    def eta(self) -> str:
        if self.completed == 0:
            return "?"
        rate = self.elapsed / self.completed
        return format_time((self.total_steps - self.completed) * rate)

    @property
    def mean_step(self) -> float:
        return self.elapsed / max(self.completed, 1)


def device_timer(fn, *args, m_small: int = 4, m_large: int = 16, reps: int = 3):
    """Seconds per invocation of `fn(*args)` on device, dispatch-amortized.

    `fn` must accept its first argument perturbed additively (chained carry
    keeps iterations data-dependent so nothing is elided).
    """

    @partial(jax.jit, static_argnums=0)
    def loop(m, *a):
        def body(carry, _):
            out = fn(a[0] + carry, *a[1:])
            leaf = jax.tree.leaves(out)[0]
            return (jnp.sum(leaf.ravel()[:1]) * 1e-20).astype(a[0].dtype), None

        carry, _ = jax.lax.scan(body, jnp.zeros([], a[0].dtype), None, length=m)
        return carry

    def run(m):
        jax.device_get(loop(m, *args))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(loop(m, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(m_large) - run(m_small)) / (m_large - m_small)
