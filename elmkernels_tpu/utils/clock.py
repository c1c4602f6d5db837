"""Wall-clock step timing with cross-host aggregation hooks.

Rebuild of the reference's perf ``Clock`` (``src/utils/utils.hh:92-103``,
``utils.cc:73-89``): accumulates per-section wall time; ``min_max_mean``
aggregates across processes (jax.process_count) when running multi-host.
"""

from __future__ import annotations

import collections
import contextlib
import time


class Clock:
    def __init__(self):
        self.totals = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_s": self.totals[k] / max(1, self.counts[k])}
                for k in self.totals}

    def min_max_mean(self, name: str):
        """Aggregate a section's mean across hosts (single-host: local)."""
        import numpy as np
        local = self.totals[name] / max(1, self.counts[name])
        try:
            import jax
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                vals = multihost_utils.process_allgather(np.array(local))
                return float(vals.min()), float(vals.max()), \
                    float(vals.mean())
        except Exception:
            pass
        return local, local, local
