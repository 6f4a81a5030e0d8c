"""Tracing / profiling utilities (SURVEY §5.1).

The reference has none (an unused ``psutil`` handle and commented-out memory
prints, src/main_missing.py:144-160).  Here:

- ``StepTimer``: wall-clock step-time + throughput meter with warmup skip;
- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory;
- ``enable_compile_cache``: persistent XLA compilation cache so repeated
  runs skip the (20-40s) TPU compile;
- ``device_memory_stats``: live HBM usage of the addressable devices.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional


def cache_dir_for_host(base: str = "/tmp/rdt_jax_cache") -> str:
    """Per-boot cache dir.  XLA:CPU AOT cache entries embed the COMPILE
    machine's target config, and /proc/cpuinfo flags are not a sufficient
    key for it: round 4 showed two hosts with identical cpuinfo flags whose
    XLA target configs differ in derived pseudo-features (e.g.
    ``prefer-no-gather``), so a /tmp cache surviving a host migration was
    load-rejected entry by entry (cpu_aot_loader "machine features don't
    match" spam) while everything recompiled anyway.  Keying on the kernel
    boot_id (+ jaxlib version) makes the cache valid exactly as long as the
    machine is: warm within a session/round, never carried across a
    migration."""
    import hashlib
    parts = []
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f.read().strip())
    except OSError:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            parts.extend(line for line in f if line.startswith("flags"))
    except OSError:
        pass
    try:
        import jaxlib
        parts.append(getattr(jaxlib, "__version__", ""))
    except ImportError:
        pass
    tag = hashlib.md5("|".join(parts).encode()).hexdigest()[:8] \
        if parts else "generic"
    return f"{base}_{tag}"


def enable_compile_cache(path: str = None) -> None:
    import jax
    path = path or cache_dir_for_host()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a code region (view in TensorBoard)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Step-time meter: call .step(n_samples) once per optimizer step."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self.samples = 0
        self._last: Optional[float] = None
        self._count = 0

    def reset_interval(self) -> None:
        """Call at epoch start so cross-epoch gaps (validation, ckpt IO)
        don't pollute the step-interval statistics."""
        self._last = None
        self._count = 0

    def step(self, n_samples: int) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                dt = now - self._last
                self.times.append(dt)
                self.samples += n_samples
        self._last = now
        return dt

    @property
    def mean_step_time(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def throughput(self) -> float:
        tot = sum(self.times)
        return self.samples / tot if tot else 0.0

    def summary(self) -> Dict[str, float]:
        return {"mean_step_time_s": self.mean_step_time,
                "samples_per_sec": self.throughput,
                "steps_measured": float(len(self.times))}


def device_memory_stats() -> List[Dict[str, float]]:
    import jax
    out = []
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out.append({"device": str(d),
                        "bytes_in_use": s.get("bytes_in_use", 0) / 2**20,
                        "peak_bytes_in_use":
                            s.get("peak_bytes_in_use", 0) / 2**20})
        except Exception:
            out.append({"device": str(d)})
    return out
