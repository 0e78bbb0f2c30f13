"""Named-section profiler (mvdatasets Profiler parity, SURVEY.md §5.1).

Same start(name)/end(name)/print_avg_times API the reference threads through
every component (reference usage: trainer.py:555,703; surf.py:342-436).
Under jit, JAX dispatch is asynchronous, so section timers measure dispatch
unless ``sync=True`` forces a device sync at section ends; for kernel-level
timelines use :func:`trace` which wraps jax.profiler for xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Profiler:
    def __init__(self, verbose: bool = False, sync: bool = False):
        self.verbose = verbose
        self.sync = sync
        self._starts: dict[str, float] = {}
        self._totals = defaultdict(float)
        self._counts = defaultdict(int)

    def _maybe_sync(self):
        if self.sync:
            import jax

            (jax.device_put(0.0) + 0).block_until_ready()

    def start(self, name: str):
        self._starts[name] = time.perf_counter()

    def end(self, name: str):
        if name not in self._starts:
            return
        self._maybe_sync()
        dt = time.perf_counter() - self._starts.pop(name)
        self._totals[name] += dt
        self._counts[name] += 1
        if self.verbose:
            print(f"[profiler] {name}: {dt * 1e3:.2f} ms")

    @contextlib.contextmanager
    def section(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.end(name)

    def avg_times_ms(self) -> dict[str, float]:
        return {
            name: 1e3 * self._totals[name] / max(self._counts[name], 1)
            for name in self._totals
        }

    def print_avg_times(self):
        print("\naverage section times:")
        for name, ms in sorted(self.avg_times_ms().items(), key=lambda kv: -kv[1]):
            print(f"  {name}: {ms:.2f} ms  (x{self._counts[name]})")


@contextlib.contextmanager
def trace(log_dir: str):
    """Device-level trace for xprof/tensorboard (jax.profiler)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
