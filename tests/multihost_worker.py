"""Worker process for tests/test_multihost.py — NOT a test module.

Each instance is a real separate JAX process in a gloo CPU cluster:
it loads only its local shard of a deterministic global batch, runs the
SAME jitted data-parallel train step as single-host training, and prints
the final (replicated) loss for the parent test to compare.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

PID, NPROC, PORT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
LOCAL_DEVICES = 2

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from image_segmentation_tpu.parallel.multihost import (
    assert_same_across_processes,
    global_batch_from_local,
    global_prebatched_from_local,
    initialize_multihost,
    process_local_batch_columns,
    process_local_indices,
    replicate_for_processes,
    replicate_result,
)

initialize_multihost(f"localhost:{PORT}", NPROC, PID)

import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.losses import DiceCELoss
from image_segmentation_tpu.models import UNet
from image_segmentation_tpu.parallel.mesh import get_mesh
from image_segmentation_tpu.train import create_train_state, make_train_step
from image_segmentation_tpu.train.state import make_adamw

assert jax.process_count() == NPROC
assert jax.device_count() == NPROC * LOCAL_DEVICES

B, S = 8, 32
mesh = get_mesh()  # all global devices on the data axis

# identical init on every process (same PRNGKey) -> replicate
state = create_train_state(
    UNet(num_classes=4, base=8), jax.random.PRNGKey(0),
    jnp.zeros((1, S, S, 3)), make_adamw(learning_rate=1e-3),
)
state = replicate_for_processes(state, mesh)

# the full dataset exists only as a recipe; each process materialises
# JUST its local rows (in a real run: decodes only those files)
rng = np.random.default_rng(0)
images = rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32)
labels = rng.integers(0, 4, (B, S, S)).astype(np.int32)
mine = process_local_indices(B, mesh)
batch = global_batch_from_local(
    (images[mine], labels[mine]), mesh, global_batch=B
)

step = make_train_step(DiceCELoss(ignore_index=3), accum_steps=2)
loss = None
with mesh:
    for _ in range(2):
        state, loss = step(state, batch)
loss = float(loss)
assert_same_across_processes(loss, mesh, name="train loss")

# --- distributed original-resolution eval across the process group ---
# The pre-batched eval layout (train/fast_eval.py) sharded over the
# global 'data' axis: each process feeds only ITS column block of every
# batch (in a real run it would decode only those files; the tiny test
# set is generated everywhere from the shared recipe and sliced). The
# fresh PRNGKey(7) state below is recreated identically by the parent
# test's single-process reference.
from image_segmentation_tpu.data.dataset import ArrayDataset
from image_segmentation_tpu.data.loader import materialize
from image_segmentation_tpu.ops import geometry as G
from image_segmentation_tpu.train import fast_eval

rng2 = np.random.default_rng(7)
items = []
for i in range(10):
    h, w = int(rng2.integers(24, 48)), int(rng2.integers(24, 48))
    img = rng2.uniform(0, 1, (h, w, 3)).astype(np.float32)
    lab = np.zeros((h, w), np.int32)
    lab[h // 2:, :] = 1 + (i % 3)
    items.append((img, lab))
val = materialize(ArrayDataset(items), S, keep_orig_labels=True)
canvases = fast_eval.pack_label_canvases(val.orig_labels)

eval_state = create_train_state(
    UNet(num_classes=4, base=8), jax.random.PRNGKey(7),
    jnp.zeros((1, S, S, 3)), make_adamw(learning_rate=1e-3),
)
eval_state = replicate_for_processes(eval_state, mesh)

Bv = jax.device_count()
n = len(val)
nb = -(-n // Bv)
idx_mat = np.minimum(np.arange(nb * Bv).reshape(nb, Bv), n - 1)
real_mat = np.arange(nb * Bv).reshape(nb, Bv) < n
cols = process_local_batch_columns(Bv, mesh)
loc = lambda a: np.asarray(a)[idx_mat[:, cols]]  # no global copy
b_inputs = (global_prebatched_from_local(loc(val.images), mesh, Bv),)
b_metas = G.ResizeMeta(
    *(global_prebatched_from_local(loc(f), mesh, Bv) for f in val.metas)
)
b_canv = global_prebatched_from_local(loc(canvases), mesh, Bv)
b_real = global_prebatched_from_local(real_mat[:, cols], mesh, Bv)
eval_epoch = fast_eval.get_eval_epoch_prebatched_fn(
    canvases.shape[1:], 4, DiceCELoss(ignore_index=3)
)
with mesh:
    conf, losses = eval_epoch(eval_state, b_inputs, b_metas, b_canv, b_real)
conf = np.asarray(replicate_result(conf, mesh))
losses = np.asarray(replicate_result(losses, mesh))
val_loss = float(losses.reshape(-1)[real_mat.reshape(-1)].mean())
assert_same_across_processes(val_loss, mesh, name="val loss")
import json as _json

print(f"EVAL {PID} {val_loss!r} "
      f"{_json.dumps(conf.reshape(-1).tolist())}", flush=True)

# fit() is single-controller; in a process group it must refuse loudly
# (its host-side uploads/checkpoint fetches assume fully-addressable
# arrays) rather than die deep inside device_put.
from image_segmentation_tpu.train.loop import fit

try:
    fit(state, None, None, loss_fn=None, epochs=1, batch_size=1,
        save_dir=".", name="x")
    raise SystemExit("fit() must refuse to run multi-process")
except NotImplementedError:
    pass

print(f"LOSS {PID} {loss!r}", flush=True)
