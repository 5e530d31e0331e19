"""Tracing / profiling / memory monitoring (aux subsystem, SURVEY.md §5).

Equivalents of the reference's ``PerformanceMonitor`` (fitter_3d/SDF_tests.py:18-61)
and ``MemoryMonitor`` (neuralSMIL/memory_optimization.py:17-64), TPU-aware:
device memory comes from jax's per-device memory_stats, host memory from
/proc/self/status (no psutil dependency). Also wraps jax.profiler for real
trace capture (the reference has no systematic tracer).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


def host_memory_mb() -> float:
    """Resident set size of this process in MB."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in MB (empty on backends without memory_stats)."""
    import jax

    out = {}
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        if "bytes_in_use" in stats:
            out[str(d)] = stats["bytes_in_use"] / 1e6
    return out


class PerformanceMonitor:
    """Section timers with a tabular report (reference SDF_tests.py:18-61)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._starts = {}

    def start(self, section: str):
        self._starts[section] = time.perf_counter()

    def end(self, section: str):
        if section in self._starts:
            self.totals[section] += time.perf_counter() - self._starts.pop(section)
            self.counts[section] += 1

    @contextlib.contextmanager
    def section(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.end(name)

    def report(self) -> str:
        lines = [f"{'section':30s} {'total s':>10s} {'count':>7s} {'mean ms':>10s}"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:30s} {t:10.3f} {c:7d} {1000*t/max(c,1):10.2f}")
        mem = device_memory_stats()
        for dev, mb in mem.items():
            lines.append(f"device {dev}: {mb:.0f} MB in use")
        lines.append(f"host RSS: {host_memory_mb():.0f} MB")
        return "\n".join(lines)


class MemoryMonitor:
    """Periodic host+device memory snapshots (reference MemoryMonitor)."""

    def __init__(self):
        self.snapshots = []

    def snapshot(self, tag: str = ""):
        entry = {"tag": tag, "t": time.time(), "host_mb": host_memory_mb()}
        entry.update({f"dev_{i}": mb for i, mb in enumerate(device_memory_stats().values())})
        self.snapshots.append(entry)
        return entry

    def peak_host_mb(self) -> float:
        return max((s["host_mb"] for s in self.snapshots), default=0.0)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
