"""Fused ViT MLP kernel vs XLA, ViT-B/16 shapes, TPU hardware.

Also checks numerical agreement on-hardware and times the attention
kernel alongside for context (both feed the keep/park table in
ops/pallas/__init__.py).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, sync, n=30):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.ops.pallas.mlp import (
        _mlp_reference,
        fused_mlp,
    )

    interp = jax.devices()[0].platform == "cpu"
    B, S, H, F = (32, 197, 768, 3072) if not interp else (2, 197, 128, 256)
    dt = jnp.bfloat16 if not interp else jnp.float32

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, H)) * 0.5, dt)
    lns = jnp.asarray(rng.normal(size=(H,)), jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(H,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(H, F)) * 0.03, dt)
    b1 = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, H)) * 0.03, dt)
    b2 = jnp.asarray(rng.normal(size=(H,)), jnp.float32)

    ref = jax.jit(lambda *a: _mlp_reference(*a, 1e-5))
    fused = jax.jit(lambda *a: fused_mlp(*a, 1e-5, interp))

    args = (x, lns, lnb, w1, b1, w2, b2)
    got = np.asarray(fused(*args), np.float32)
    want = np.asarray(ref(*args), np.float32)
    err = float(np.max(np.abs(got - want)))

    # Chain REPS applications inside one jit so the per-dispatch tunnel
    # overhead (~5-10 ms through axon) doesn't swamp a sub-ms op.
    REPS = 24 if not interp else 2

    def chain(op):
        @jax.jit
        def run(xx):
            def body(c, _):
                return op(c, lns, lnb, w1, b1, w2, b2), None
            y, _ = jax.lax.scan(body, xx, None, length=REPS)
            return y
        return run

    ref_c = chain(lambda *a: _mlp_reference(*a, 1e-5))
    fused_c = chain(lambda *a: fused_mlp(*a, 1e-5, interp))

    sync = lambda: None
    t_ref = timeit(lambda: ref_c(x), sync) / REPS
    t_fused = timeit(lambda: fused_c(x), sync) / REPS
    print(json.dumps({
        "shape": [B, S, H, F], "dtype": str(dt.__name__),
        "max_err": err,
        "xla_ms": round(t_ref * 1e3, 4),
        "fused_ms": round(t_fused * 1e3, 4),
        "speedup": round(t_ref / t_fused, 3),
    }))


if __name__ == "__main__":
    main()
