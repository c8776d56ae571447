"""Persistent-compilation-cache utility (utils/profiling.py
enable_compilation_cache; CLI: run.py / serve.app --compile-cache).

The reference stack has no compile step (eager torch) — under XLA the
first compile of a training step or serving bucket costs 20-40 s on
TPU, so a production deployment needs the cache. These tests pin the
utility's contract on the CPU backend: entries are written on first
compile, and a fresh process with the same cache dir gets a disk hit
(observed via jax's own cache-hit logger) instead of recompiling.
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from image_segmentation_tpu.utils import enable_compilation_cache

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _restore_defaults():
    # hand the process back to the session-wide shared cache (conftest)
    # rather than jax defaults, so later tests in this worker stay warm
    shared = os.environ.get(
        "ISTPU_TEST_XLA_CACHE", "/tmp/istpu_test_xla_cache")
    if shared:
        enable_compilation_cache(shared, min_compile_seconds=0.3)
    else:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def test_cache_populates_on_first_compile(tmp_path):
    cache = tmp_path / "xla_cache"
    try:
        enable_compilation_cache(str(cache), min_compile_seconds=0.0)

        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        f(jnp.ones((16, 16), jnp.float32)).block_until_ready()
        entries = [e for e in os.listdir(cache) if e.endswith("-cache")]
        assert entries, "no persistent cache entries written"
    finally:
        _restore_defaults()


@pytest.mark.slow
def test_second_process_hits_cache(tmp_path):
    """Run the same tiny program in two subprocesses sharing the cache
    dir; the second must log a compilation-cache hit (jax emits
    'Persistent compilation cache hit' at WARNING when
    jax_explain_cache_misses is irrelevant — assert on the hit line)."""
    cache = str(tmp_path / "xla_cache")
    prog = (
        "import os, sys, logging\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "sys.path.insert(0, %r)\n"
        "logging.basicConfig(level=logging.DEBUG)\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from image_segmentation_tpu.utils import enable_compilation_cache\n"
        "enable_compilation_cache(%r, min_compile_seconds=0.0)\n"
        "f = jax.jit(lambda x: jnp.tanh(x) @ x.T)\n"
        "f(jnp.ones((16, 16), jnp.float32)).block_until_ready()\n"
        "print('DONE')\n"
    ) % (_ROOT, cache)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    first = subprocess.run([sys.executable, "-c", prog],
                           capture_output=True, text=True, timeout=300,
                           env=env)
    assert first.returncode == 0, first.stderr[-2000:]
    assert "DONE" in first.stdout
    second = subprocess.run([sys.executable, "-c", prog],
                            capture_output=True, text=True, timeout=300,
                            env=env)
    assert second.returncode == 0, second.stderr[-2000:]
    assert "DONE" in second.stdout
    blob = second.stdout + second.stderr
    assert "cache hit" in blob.lower(), (
        "second process did not report a persistent-cache hit:\n"
        + blob[-2000:]
    )
