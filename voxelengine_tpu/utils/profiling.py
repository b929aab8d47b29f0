"""Profiling / metrics utilities.

Formalizes the reference's scattered instrumentation: the ``std::chrono``
brackets around worldgen and brickmap build (``main.cu:22-32``), the kernel
timing printout (``VolumeRaytracer.cu:587-595``), the EMA frame-time ->
"Avg FPS" window title (``main.cu:170-194``, alpha = 1/100), and the
average-DDA-steps quality metric (``DDATestCpp.cpp:618-625``).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List

import jax


class _TimedHandle:
    """Set ``sync`` to the bracket's produced arrays (any pytree) so the
    timer can block on them."""

    sync = None


@contextlib.contextmanager
def timed(label: str, sink: Dict[str, float] | None = None, verbose: bool = True):
    """Wall-clock bracket, the ``cudaDeviceSynchronize``-then-read-clock
    analog.  JAX dispatch is async and ``jax.effects_barrier`` only awaits
    EFFECTFUL work — to include in-flight pure computations/transfers,
    hand the produced values to the bracket::

        with timed("build") as t:
            bm = build(...)
            t.sync = bm          # block_until_ready'd before the clock read
    """
    h = _TimedHandle()
    t0 = time.perf_counter()
    yield h
    jax.effects_barrier()
    if h.sync is not None:
        jax.block_until_ready(h.sync)
    ms = (time.perf_counter() - t0) * 1000.0
    if sink is not None:
        sink[label] = ms
    if verbose:
        print(f"{label}: {ms:.2f}ms")


@dataclass
class FrameTimer:
    """EMA frame-time tracker (``main.cu:177-194``, alpha = 1/100)."""

    alpha: float = 1.0 / 100.0
    ema_ms: float = 0.0
    _last: float = field(default=0.0, repr=False)
    frames: int = 0

    def tick(self) -> float:
        now = time.perf_counter()
        if self.frames > 0:
            dt_ms = (now - self._last) * 1000.0
            if self.frames == 1:
                self.ema_ms = dt_ms
            else:
                self.ema_ms = self.ema_ms * (1 - self.alpha) + dt_ms * self.alpha
        self._last = now
        self.frames += 1
        return self.ema_ms

    @property
    def fps(self) -> float:
        return 1000.0 / self.ema_ms if self.ema_ms > 0 else 0.0


@dataclass
class TraceStats:
    """Aggregate ray metrics: Mrays/s + average DDA steps per ray."""

    rays: int = 0
    total_ms: float = 0.0
    total_steps: int = 0

    def record(self, num_rays: int, ms: float, steps_sum: int) -> None:
        self.rays += num_rays
        self.total_ms += ms
        self.total_steps += steps_sum

    @property
    def mrays_per_s(self) -> float:
        return (self.rays / 1e6) / (self.total_ms / 1e3) if self.total_ms else 0.0

    @property
    def avg_steps(self) -> float:
        return self.total_steps / self.rays if self.rays else 0.0
