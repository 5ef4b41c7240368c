"""Wall-clock measurement harness.

TPU-native equivalent of the reference's chrono phase accumulators
(reference: serial_newblock_clock.cpp:24-35, per-phase brackets; SURVEY.md §5):
device timings use ``block_until_ready`` fences, separate compile (first call)
from steady state, and report medians over several iterations.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Sequence


@dataclasses.dataclass
class Timing:
    name: str
    compile_ms: float
    median_ms: float
    min_ms: float
    iters: int

    def __str__(self) -> str:
        return (
            f"{self.name}: {self.median_ms:.3f} ms median "
            f"(min {self.min_ms:.3f}, compile {self.compile_ms:.1f}, n={self.iters})"
        )


def _ready(x):
    import jax

    jax.block_until_ready(x)
    return x


def measure(fn: Callable, *args, name: str = "fn", warmup: int = 1, iters: int = 5) -> Timing:
    """Times ``fn(*args)`` on device: first call = compile+run, then ``warmup``
    discarded runs, then ``iters`` timed runs."""
    t0 = time.perf_counter()
    _ready(fn(*args))
    compile_ms = (time.perf_counter() - t0) * 1e3
    for _ in range(warmup):
        _ready(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ready(fn(*args))
        samples.append((time.perf_counter() - t0) * 1e3)
    samples.sort()
    return Timing(
        name=name,
        compile_ms=compile_ms,
        median_ms=samples[len(samples) // 2],
        min_ms=samples[0],
        iters=iters,
    )


def measure_host(fn: Callable, *args, name: str = "fn", iters: int = 3) -> Timing:
    """Times a host-side function (no device fences); min over iters."""
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(*args)
        samples.append((time.perf_counter() - t0) * 1e3)
    samples.sort()
    return Timing(
        name=name,
        compile_ms=0.0,
        median_ms=samples[len(samples) // 2],
        min_ms=samples[0],
        iters=iters,
    )
