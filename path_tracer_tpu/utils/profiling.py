"""Timing and throughput instrumentation.

Replaces the reference's ``benchmark_function`` println timer
(``mod.rs:909-914``) with structured counters: wall-clock scopes, traced-ray
counters (Mrays/s is the headline metric), and optional ``jax.profiler``
trace capture.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class Timer:
    name: str = ""
    elapsed: float = 0.0
    _start: float | None = None

    def start(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def stop(self) -> float:
        if self._start is not None:
            self.elapsed += time.perf_counter() - self._start
            self._start = None
        return self.elapsed


@contextlib.contextmanager
def timed(name: str = "", verbose: bool = False):
    t = Timer(name).start()
    try:
        yield t
    finally:
        t.stop()
        if verbose:
            print(f"Elapsed time ({name}): {t.elapsed:.4f}s")


@dataclass
class RenderStats:
    """Accumulated over a render: wall time, samples, traced ray segments."""

    wall_seconds: float = 0.0
    device_seconds: float = 0.0
    num_samples: int = 0  # camera samples (pixels x spp)
    num_rays: int = 0  # traced ray segments (sum of alive lanes per bounce)
    num_dispatches: int = 0
    # per-pixel samples restored from a checkpoint (0 = fresh render);
    # the observable proof a render RESUMED instead of restarting
    resumed_samples: int = 0
    extra: dict = field(default_factory=dict)

    @property
    def mrays_per_sec(self) -> float:
        return self.num_rays / self.wall_seconds / 1e6 if self.wall_seconds else 0.0

    @property
    def msamples_per_sec(self) -> float:
        return (
            self.num_samples / self.wall_seconds / 1e6 if self.wall_seconds else 0.0
        )

    def merge(self, other: "RenderStats") -> None:
        self.wall_seconds += other.wall_seconds
        self.device_seconds += other.device_seconds
        self.num_samples += other.num_samples
        self.num_rays += other.num_rays
        self.num_dispatches += other.num_dispatches


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Capture a jax.profiler trace when log_dir is given."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def format_eta(seconds: float) -> str:
    """h:mm:ss formatting, parity with the reference CLI's progress line
    (``cmd_render.rs:54-80``)."""
    seconds = max(int(seconds), 0)
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    return f"{h}:{m:02d}:{s:02d}"
