"""Confusion-count formulation probe: scatter (bincount) vs one-hot matmul.

The original-resolution eval protocol (train/fast_eval.py) counts a
(C, C) confusion matrix per image over the static label canvas. Two
formulations compute identical counts:

  * bincount: flatten true*C+pred indices and scatter-add — on TPU XLA
    lowers this to a serialized scatter, no MXU work;
  * one-hot matmul: one-hot(label)ᵀ @ one-hot(pred), a (P, C)·(P, C)
    contraction XLA tiles onto the MXU (the formulation
    metrics/confusion.py has always used for fixed-shape batches).

This probe times both on eval-protocol shapes (B canvas-sized images per
dispatch) so the choice in fast_eval._eval_batch_core carries a measured
receipt. Run on the TPU: python benchmarks/confusion_probe.py
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--repeat", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, H, C = args.batch, args.canvas, args.classes
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, C, (B, H, H)), jnp.int32)
    # ~15% FILL rows like a real canvas tail
    labels = jnp.where(
        jnp.asarray(rng.uniform(size=(B, H, H)) < 0.15), 255, labels
    )
    preds = jnp.asarray(rng.integers(0, C, (B, H, H)), jnp.int32)
    valid = labels != 255

    @jax.jit
    def via_bincount(labels, preds, valid):
        def one(l, p, v):
            idx = jnp.where(v, jnp.clip(l, 0, C - 1) * C + p, C * C)
            return jnp.bincount(idx.reshape(-1), length=C * C + 1)[:-1].reshape(
                C, C
            )

        return jax.vmap(one)(labels, preds, valid).sum(axis=0)

    @jax.jit
    def via_matmul(labels, preds, valid):
        def one(l, p, v):
            t = jax.nn.one_hot(l.reshape(-1), C, dtype=jnp.float32)
            t = t * v.reshape(-1, 1).astype(jnp.float32)
            pp = jax.nn.one_hot(p.reshape(-1), C, dtype=jnp.float32)
            return jnp.einsum("nt,np->tp", t, pp)

        return jax.vmap(one)(labels, preds, valid).sum(axis=0).astype(jnp.int32)

    a = np.asarray(via_bincount(labels, preds, valid))
    b = np.asarray(via_matmul(labels, preds, valid))
    assert (a == b).all(), "formulations disagree"

    results = {}
    for name, fn in (("bincount", via_bincount), ("matmul", via_matmul)):
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(labels, preds, valid)
            np.asarray(out[0, 0])  # hard sync (tunnel-safe)
            best = min(best, time.perf_counter() - t0)
        ms = best / args.iters * 1e3
        results[name] = round(ms, 3)
        print(
            json.dumps(
                {"metric": f"confusion_{name}_ms_per_dispatch",
                 "value": round(ms, 3), "unit": "ms",
                 "shape": [B, H, H], "classes": C}
            )
        )
    print(
        json.dumps(
            {"summary": "confusion_probe",
             "speedup_matmul_over_bincount": round(
                 results["bincount"] / results["matmul"], 2
             )}
        ),
        file=sys.stdout,
    )


if __name__ == "__main__":
    main()
