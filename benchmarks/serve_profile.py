"""Per-stage breakdown of the serving single-stream request path.

Where do the ~57 ms of `bench.py --serve` single-stream p50 go?
Stages timed separately (median over --steps):

  stage      host resize+pad to the model grid + uint8 packing
             (serve/engine.py stage_request)
  upload     host->device transfer of the packed inputs
  forward    the jitted device forward (hard-synced)
  fetch      device->host of the (T,T,C) bf16 scores
  unstage    host inverse geometry + argmax + colorize
             (serve/engine.py unstage_result)
  e2e        engine.segment() whole path (sanity: ~= sum of stages)

Knowing the split tells where optimization pays: host stages scale with
CPU cores (this box has ONE), device stages with the chip, and
upload/fetch with the link (here an axon tunnel with real RTT; on-host
TPUs pay microseconds).

Usage: python benchmarks/serve_profile.py [--steps 40] [--size 256]

MEASURED (v5e via axon, single-core host, 2026-08-19, steps=40,
300x400 request -> UNet 256px, fast_transfer):
  stage 1.89 ms | upload 37.02 ms | forward 34.62 ms |
  forward+score-fetch 49.36 ms | unstage 5.77 ms | e2e 66.09 ms
Interpretation: host compute is 7.7 ms of the 66 (stage+unstage); the
rest is device ROUND TRIPS over the tunnel (each timed leg embeds >=1
RTT — upload 192 KB in 37 ms vs score-fetch 512 KB in +14.7 ms shows
latency, not bandwidth, dominates). Single-stream latency is therefore
at the link's speed of light; the lever that amortizes it is request
micro-batching (serve/batching.py, default on), which is exactly why
concurrency-16 reaches 30 req/s. An on-host TPU deployment pays
microseconds for the same legs, leaving the 7.7 ms host path + ~5 ms
batch-1 forward.
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def med_ms(fn, steps):
    ts = []
    for _ in range(steps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return round(statistics.median(ts), 2)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from image_segmentation_tpu.models import UNet
    from image_segmentation_tpu.serve.engine import (
        InferenceEngine,
        stage_request,
        unstage_result,
    )

    on_accel = jax.devices()[0].platform != "cpu"
    size = args.size if on_accel else 64
    steps = args.steps if on_accel else 5

    model = UNet(num_classes=4, base=64 if on_accel else 8,
                 dtype=jnp.bfloat16 if on_accel else jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)
    engine = InferenceEngine()
    engine.register("unet", model, variables, target_size=size)
    entry = engine.models["unet"]

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (300, 400, 3)).astype(np.float32)

    # warm everything once
    engine.segment(img, "unet")

    inputs, meta = stage_request(img, entry, None, engine.fast_transfer)
    dev_inputs = [jnp.asarray(x[None]) for x in inputs]
    scores_dev = entry.forward(*dev_inputs)
    scores = np.asarray(scores_dev, dtype=np.float32)[0]

    out = {
        "stage_ms": med_ms(
            lambda: stage_request(img, entry, None, engine.fast_transfer),
            steps),
        "upload_ms": med_ms(
            lambda: [np.asarray(jnp.asarray(x[None])[0, 0, 0, 0])
                     for x in inputs],
            steps),
        "forward_ms": med_ms(
            lambda: np.asarray(entry.forward(*dev_inputs)[0, 0, 0]),
            steps),
        # jax caches the host copy after the first np.asarray, so time a
        # fresh forward+full-fetch and report the delta vs forward alone
        "forward_fetch_ms": med_ms(
            lambda: np.asarray(entry.forward(*dev_inputs),
                               dtype=np.float32),
            steps),
        "unstage_ms": med_ms(
            lambda: unstage_result(scores, meta, entry), steps),
        "e2e_ms": med_ms(lambda: engine.segment(img, "unet"), steps),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
