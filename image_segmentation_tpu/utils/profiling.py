"""Tracing / profiling / debugging hooks (SURVEY.md §5.1-5.2).

The reference has none of this (tqdm postfix strings were its whole
observability story, reference utils/training.py:37,60). TPU-native
equivalents:

  * `trace_context(logdir)` — wraps a code region in a `jax.profiler`
    trace; view the dump with TensorBoard's profile plugin or xprof.
  * `StepTimer` — wall-clock per-step timing with warmup skip and
    images/sec summaries (device-synced via value fetch: see bench.py —
    block_until_ready can no-op over remote device tunnels).
  * `enable_nan_checks()` — flips `jax_debug_nans` (the race-detector /
    sanitizer analogue for a functional array program: any NaN produced
    under jit raises at the producing op).
  * `enable_compilation_cache(dir)` — persistent XLA compilation cache
    shared across processes: the second serving start / training run of
    the same program skips its 20-40 s first-compile entirely. The
    reference has no compile step at all (eager torch), so this is the
    deployment-latency knob the TPU design newly needs.
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional


@contextlib.contextmanager
def trace_context(logdir: Optional[str] = None):
    """Profile the enclosed region with jax.profiler (no-op if logdir is
    None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


def enable_compilation_cache(
    cache_dir: str, min_compile_seconds: float = 1.0
) -> None:
    """Persist compiled XLA executables under `cache_dir` and reuse them
    across processes.

    Set this before the first compilation (it applies to everything
    compiled afterwards). Programs cheaper than `min_compile_seconds`
    are not persisted — they recompile faster than a disk round-trip;
    pass 0.0 to persist everything (tests do).

    The cache key covers the HLO, compile options, and backend/compiler
    version, so a stale entry can never be served to a different
    program or chip generation; a populated directory is safe to ship
    alongside AOT `.istpu` artifacts for fleet rollouts.
    """
    import os

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_seconds
    )
    # persist regardless of executable size (the default size floor can
    # silently skip small-but-slow-to-compile programs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # jax initializes its on-disk cache object at most once per process;
    # if something already compiled against a different cache_dir, the
    # config update alone is ignored and entries keep landing in the old
    # directory. Reset the singleton so the new directory takes effect
    # (private API, so tolerate its absence on future jax versions).
    try:
        from jax._src import compilation_cache as _cc

        # _path is a PosixGPath, cache_dir a str — compare as normalized
        # absolute strings or the inequality is vacuously true and the
        # cache resets on every call.
        current = os.path.abspath(str(getattr(_cc._cache, "_path", cache_dir)))
        if _cc._cache is not None and current != os.path.abspath(cache_dir):
            _cc.reset_cache()
    except (ImportError, AttributeError):  # pragma: no cover
        pass


class StepTimer:
    """Per-step wall-clock timing with warmup exclusion."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._count += 1
        if self._count > self.warmup_steps:
            self.times.append(dt)

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    @property
    def mean_s(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def images_per_sec(self, batch_size: int) -> float:
        m = self.mean_s
        return batch_size / m if m == m and m > 0 else float("nan")

    def summary(self, batch_size: Optional[int] = None) -> str:
        s = f"{len(self.times)} steps, mean {self.mean_s * 1e3:.2f} ms"
        if batch_size:
            s += f", {self.images_per_sec(batch_size):.1f} img/s"
        return s
