"""Wall-clock section profiler.

Equivalent of the reference Profiler (/root/reference/src/utils/
profile_util.py) with the CUDA sync replaced by jax block_until_ready on
demand; also exposes jax.profiler trace capture for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Profiler:
    def __init__(self, verbose: bool = False):
        self.verbose = verbose
        self.enabled = True
        self._start: dict[str, float] = {}
        self.log = defaultdict(list)

    def tick(self, name: str):
        if self.enabled:
            self._start[name] = time.perf_counter()

    def tok(self, name: str, sync=None):
        if not self.enabled or name not in self._start:
            return
        if sync is not None:
            jax.block_until_ready(sync)
        dt = (time.perf_counter() - self._start.pop(name)) * 1000.0
        self.log[name].append(dt)
        if self.verbose:
            print(f"[prof] {name}: {dt:.2f} ms")

    @contextlib.contextmanager
    def section(self, name: str, sync_value=None):
        self.tick(name)
        try:
            yield
        finally:
            self.tok(name, sync_value)

    def summary(self) -> dict:
        return {
            k: {
                "count": len(v),
                "mean_ms": sum(v) / max(len(v), 1),
                "total_ms": sum(v),
            }
            for k, v in self.log.items()
        }

    def report(self):
        for k, s in sorted(self.summary().items(), key=lambda kv: -kv[1]["total_ms"]):
            print(f"[prof] {k:32s} n={s['count']:5d} mean={s['mean_ms']:8.2f}ms "
                  f"total={s['total_ms']/1000:7.2f}s")


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
