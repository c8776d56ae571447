"""Profile the UNet train step: component timings + optional XLA trace.

Breaks the 256px B=128 bf16 train step into measurable pieces so the
overhead over 3x-forward (VERDICT round-1 weak item 2) can be localised:

  fwd        train-mode forward only (BN batch stats, no grad)
  grad       value_and_grad of loss (no optimizer update)
  step       the full production train step (grad + AdamW + BN update)
  loss       loss on precomputed logits
  opt        AdamW update on precomputed grads

With --trace DIR, also dumps a jax.profiler trace of a few steps and
prints the top device ops by self-time parsed from the perfetto JSON.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, sync, steps=10):
    # sync the WARMUP result too: sync() with no value is a no-op, and an
    # in-flight warmup execution would otherwise bleed into the timed
    # window (matters for the microsecond-scale 'loss'/'opt' components)
    sync(fn())  # compile + hard sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--trace", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from image_segmentation_tpu.losses import DiceCELoss
    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.train import create_train_state, make_train_step
    from image_segmentation_tpu.train.state import make_adamw

    on_accel = jax.devices()[0].platform != "cpu"
    B = args.batch if on_accel else 4
    S = args.size if on_accel else 64
    model = UNet(num_classes=4, base=64 if on_accel else 8,
                 dtype=jnp.bfloat16 if on_accel else jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (B, S, S)), jnp.int32)
    tx = make_adamw(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), x[:1], tx)
    loss_fn = DiceCELoss(ignore_index=3)

    def sync(v=None):
        jax.block_until_ready(v) if v is not None else None
        # value fetch = hard sync over the axon tunnel
        if v is not None:
            leaf = jax.tree_util.tree_leaves(v)[0]
            np.asarray(leaf).ravel()[:1]

    results = {}

    fwd = jax.jit(lambda s, xb: s.apply_fn(
        {"params": s.params, "batch_stats": s.batch_stats}, xb,
        train=True, mutable=["batch_stats"]))
    results["fwd"] = timed(lambda: fwd(state, x), sync, args.steps)

    def loss_of(params, bs, xb, yb):
        out, mut = state.apply_fn(
            {"params": params, "batch_stats": bs}, xb, train=True,
            mutable=["batch_stats"])
        return loss_fn(out, yb), mut["batch_stats"]

    grad = jax.jit(jax.value_and_grad(loss_of, has_aux=True),
                   static_argnums=())
    results["grad"] = timed(lambda: grad(state.params, state.batch_stats, x, y),
                            sync, args.steps)

    logits, _ = fwd(state, x)
    loss_j = jax.jit(lambda lg, yb: loss_fn(lg, yb))
    results["loss"] = timed(lambda: loss_j(logits, y), sync, args.steps)

    (_, _), grads = grad(state.params, state.batch_stats, x, y)
    opt = jax.jit(lambda g, o, p: tx.update(g, o, p))
    results["opt"] = timed(lambda: opt(grads, state.opt_state, state.params),
                           sync, args.steps)

    # LAST: the production step donates its input state, invalidating the
    # buffers every other measurement reads.
    step = make_train_step(loss_fn)
    st = [state]

    def run_step():
        s, l = step(st[0], (x, y))
        st[0] = s
        return l
    results["step"] = timed(run_step, sync, args.steps)

    ms = {k: round(v * 1e3, 2) for k, v in results.items()}
    ms["overhead_vs_3fwd"] = round(
        (results["step"] - 3 * results["fwd"]) * 1e3, 2)
    ms["img_per_sec"] = round(B / results["step"], 1)
    print(json.dumps(ms))

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                run_step()
            sync(st[0].params)
        files = glob.glob(
            os.path.join(args.trace, "**", "*.trace.json.gz"), recursive=True)
        if files:
            with gzip.open(sorted(files)[-1], "rt") as f:
                trace = json.load(f)
            durs = {}
            for ev in trace.get("traceEvents", []):
                if ev.get("ph") == "X" and "dur" in ev:
                    name = ev.get("name", "?")
                    # keep device-lane ops only (heuristically: XLA op names)
                    durs[name] = durs.get(name, 0) + ev["dur"]
            top = sorted(durs.items(), key=lambda kv: -kv[1])[:40]
            for name, d in top:
                print(f"{d/1e3/3:10.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
