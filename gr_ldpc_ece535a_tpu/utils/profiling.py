"""Profiling and throughput metrics (absent in the reference, SURVEY.md §5).

``trace`` wraps ``jax.profiler.trace`` for TensorBoard-compatible device
traces; ``Timer``/``ThroughputMeter`` give wall-clock and bits-per-second
counters for pipeline stages (the per-kernel tokens/s analog).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

__all__ = ["Timer", "ThroughputMeter", "device_sync", "trace"]


def device_sync(x):
    """True device synchronization for timing: fetch a scalar to host.

    On tunneled/experimental platforms ``jax.block_until_ready`` can return
    at dispatch acknowledgement rather than completion (observed on the axon
    TPU tunnel: a 4096^3 matmul "finished" at 7x the chip's peak FLOP rate),
    silently turning wall-clock measurements into dispatch-latency
    measurements. Fetching any device value to host is a hard sync point on
    every backend. Returns ``x`` unchanged. See bench.py for the
    chained-slope methodology that also cancels the fetch round-trip.
    """
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[0])
    return x


class Timer:
    """Context-manager stopwatch: ``with Timer() as t: ...; t.elapsed``."""

    def __init__(self) -> None:
        self.elapsed = 0.0
        self._t0: Optional[float] = None

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0


class ThroughputMeter:
    """Accumulate (items, seconds) across steps; report rates.

    The per-chip decoded-info-bits/s counter the north-star metric reads
    (BASELINE.md): ``meter.add(frames * K, t)``; ``meter.rate`` in items/s.
    """

    def __init__(self, unit: str = "bits") -> None:
        self.unit = unit
        self.items = 0.0
        self.seconds = 0.0
        self.steps = 0

    def add(self, items: float, seconds: float) -> None:
        self.items += items
        self.seconds += seconds
        self.steps += 1

    @contextlib.contextmanager
    def step(self, items: float) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.add(items, time.perf_counter() - t0)

    @property
    def rate(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0

    def __repr__(self) -> str:
        return (f"<ThroughputMeter {self.rate:.3e} {self.unit}/s "
                f"over {self.steps} steps>")


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Device+host profiler trace viewable in TensorBoard/XProf."""
    import jax
    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield


def enable_persistent_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a writable directory.

    On tunneled TPU platforms every first-seen program shape costs a remote
    compile (~20-40 s for the simple ops, minutes for the fused pallas
    programs); the persistent cache makes that a one-time cost per machine.
    Respects an existing JAX_COMPILATION_CACHE_DIR. Called by the CLI apps
    at startup; library users opt in explicitly. Returns the directory.
    """
    import os

    import jax

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    if path is None:
        path = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "gr_ldpc_ece535a_tpu", "jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
