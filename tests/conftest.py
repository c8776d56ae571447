"""Test configuration: force CPU backend with 8 virtual devices.

Must run before the first `import jax` anywhere in the test session, which
pytest guarantees because conftest.py is imported first.

Multi-device semantics are tested with XLA's host-platform device-count
trick (the standard JAX fake-multi-device setup, replacing the "fake
cluster" the reference never had — see SURVEY.md §4).
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The harness exports JAX_PLATFORMS=axon (the TPU tunnel) and the plugin
# overrides plain env-var selection, so force CPU via jax.config before
# any backend initialisation.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of cwd.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# Share compiled XLA programs across test processes and suite runs: the
# core tier is compile-dominated (many tests jit the same tiny-shape
# train/eval programs), and under xdist each worker process would
# otherwise recompile every one of them. The on-disk cache dedupes
# compiles across workers within a run and makes repeat runs start
# warm. Override the location with ISTPU_TEST_XLA_CACHE; set it to the
# empty string to disable (e.g. when timing cold compiles).
_cache_dir = os.environ.get(
    "ISTPU_TEST_XLA_CACHE", "/tmp/istpu_test_xla_cache"
)
if _cache_dir:
    from image_segmentation_tpu.utils import enable_compilation_cache

    enable_compilation_cache(_cache_dir, min_compile_seconds=0.3)
