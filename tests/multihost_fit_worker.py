"""Worker process for the fit_multihost test — NOT a test module.

Runs the full multi-host training loop (train/multihost_loop.py) on a
deterministic recipe shared with the parent test, then prints its
history for comparison against single-process fit() on the same data.

Usage: python multihost_fit_worker.py <pid> <nproc> <port> <save_dir>
"""
import json
import os
import sys

PID, NPROC, PORT, SAVE_DIR = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
LOCAL_DEVICES = 2

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
)
os.environ["JAX_PLATFORMS"] = "cpu"
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import jax

jax.config.update("jax_platforms", "cpu")

from image_segmentation_tpu.parallel.multihost import initialize_multihost

initialize_multihost(f"localhost:{PORT}", NPROC, PID)

import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.losses import DiceCELoss
from image_segmentation_tpu.models import UNet
from image_segmentation_tpu.train import create_train_state
from image_segmentation_tpu.train.multihost_loop import fit_multihost
from image_segmentation_tpu.train.state import make_adamw
from multihost_recipe import make_train_val

assert jax.process_count() == NPROC

train, val = make_train_val()
state = create_train_state(
    UNet(num_classes=4, base=8), jax.random.PRNGKey(0),
    jnp.zeros((1, 32, 32, 3)), make_adamw(learning_rate=1e-3),
)
cfg = DiceCELoss(ignore_index=3)
res = fit_multihost(
    state, train, val, loss_fn=cfg, epochs=2, batch_size=8,
    save_dir=SAVE_DIR, name="mh", eval_loss_cfg=cfg, seed=0,
    verbose=False,
)
# preemption recovery: a fresh state resumes from the '_last' checkpoint
# and continues to epoch 4 with carried-over history/best
state2 = create_train_state(
    UNet(num_classes=4, base=8), jax.random.PRNGKey(99),
    jnp.zeros((1, 32, 32, 3)), make_adamw(learning_rate=1e-3),
)
res2 = fit_multihost(
    state2, train, val, loss_fn=cfg, epochs=4, batch_size=8,
    save_dir=SAVE_DIR, name="mh", eval_loss_cfg=cfg, seed=0,
    verbose=False, resume=True,
)
out = {
    "train_loss": res.history["train_loss"],
    "val_loss": res.history["val_loss"],
    "val_iou": res.history["val_iou"],
    "val_dice": res.history["val_dice"],
    "best_miou": res.best["miou"],
    "resumed_train_loss": res2.history["train_loss"],
    "resumed_val_iou": res2.history["val_iou"],
    "resumed_best_miou": res2.best["miou"],
}
print(f"FITMH {PID} {json.dumps(out)}", flush=True)
