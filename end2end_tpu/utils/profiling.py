"""Tracing / profiling / observability helpers (SURVEY.md §7).

The reference has no tracing or metrics subsystem; the TPU-native story is:
  * `trace(logdir)` — context manager around jax.profiler.trace; open the
    result in TensorBoard (or xprof) to see per-kernel device timelines.
  * `log_compiles()` — logs every XLA compilation; recompiles are the #1
    perf footgun with bucketed shapes (SURVEY.md §7 metrics row).
  * `Throughput` — tiny steady-state throughput meter used by bench.py and
    production loops (wall-time, iters/s, and a user-supplied units/s).
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger("end2end_tpu")


@contextlib.contextmanager
def trace(logdir: str):
    """Profile everything in the block into `logdir` (TensorBoard format)."""
    with jax.profiler.trace(logdir):
        yield
    logger.info("profiler trace written to %s", logdir)


@contextlib.contextmanager
def log_compiles(enabled: bool = True):
    """Log every XLA compilation inside the block (recompile detector)."""
    with jax.log_compiles(enabled):
        yield


class Throughput:
    """Steady-state throughput meter.

    >>> meter = Throughput(units_per_iter=B * T)
    >>> for _ in range(iters):
    ...     out = step(...)
    >>> jax.block_until_ready(out); print(meter.stop(iters))
    """

    def __init__(self, units_per_iter: float = 1.0):
        self.units_per_iter = units_per_iter
        self.t0 = time.perf_counter()

    def stop(self, iters: int):
        dt = time.perf_counter() - self.t0
        return {
            "seconds": dt,
            "iters_per_s": iters / dt,
            "units_per_s": iters * self.units_per_iter / dt,
        }
