"""Per-stage profiling with the reference's stage taxonomy.

Reference: ad-hoc wall stamps t0..t6 around sync/deskew/odom/cut/recut/BA/
margi (local_mapping.cpp:359-548) plus RSS sampling (node.hpp:99-124).
Here: a StageTimer context accumulating per-stage wall time (device work is
block_until_ready-fenced when `sync=True`), an RSS reader, and an optional
jax.profiler trace wrapper.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    STAGES = ("sync", "deskew", "downsample", "odom", "cut", "recut", "ba",
              "margi", "other")

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.acc = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.perf_counter()
        yield
        if self.sync and fence is not None:
            jax.block_until_ready(fence)
        self.acc[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> dict:
        return {k: {"total_s": round(v, 4),
                    "per_call_ms": round(1e3 * v / max(self.counts[k], 1), 3)}
                for k, v in sorted(self.acc.items())}


def rss_gb() -> float:
    """Resident set size in GB (get_memory analog, node.hpp:99-124)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1048576.0
    except OSError:
        pass
    return -1.0


@contextlib.contextmanager
def device_trace(logdir: str | None):
    """jax.profiler trace for TPU timeline capture (SURVEY.md section 5.1)."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
