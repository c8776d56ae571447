"""default_compiler_options (train/steps.py): the measured-win TPU
compile options must never leak onto backends that reject them.

On the CPU backend (this suite) the probe must return None — the
options are TPU-only — and the opt-out env var must force None
everywhere. The TPU acceptance itself is exercised by every training
run on the chip (benchmarks/xla_flags_sweep.py holds the measurement).
"""
import os

import jax
import jax.numpy as jnp

from image_segmentation_tpu.losses import DiceCELoss
from image_segmentation_tpu.models import UNet
from image_segmentation_tpu.train import create_train_state, make_train_step
from image_segmentation_tpu.train.state import make_adamw
from image_segmentation_tpu.train.steps import default_compiler_options


def test_none_on_cpu_backend():
    default_compiler_options.cache_clear()
    assert jax.devices()[0].platform == "cpu"
    assert default_compiler_options() is None


def test_env_opt_out_forces_none():
    default_compiler_options.cache_clear()
    os.environ["ISTPU_NO_COMPILER_OPTIONS"] = "1"
    try:
        assert default_compiler_options() is None
    finally:
        del os.environ["ISTPU_NO_COMPILER_OPTIONS"]
        default_compiler_options.cache_clear()


def test_train_step_compiles_and_runs_with_resolved_options():
    model = UNet(num_classes=4, base=8)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        make_adamw(1e-3),
    )
    step = make_train_step(DiceCELoss())
    x = jnp.zeros((2, 32, 32, 3))
    y = jnp.zeros((2, 32, 32), jnp.int32)
    state, loss = step(state, (x, y))
    assert jnp.isfinite(loss)
