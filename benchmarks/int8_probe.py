"""Probe: is an int8 conv actually faster than bf16 on this TPU?

Decision gate for a quantized (PTQ int8) serving path. v5e advertises
2x int8 MXU throughput over bf16, but the win only materialises if
XLA lowers an int8 conv_general_dilated (int8 x int8 -> int32 via
preferred_element_type) onto the int8 MXU path rather than upcasting.
Measure before building: if the probe shows <1.3x on the production
UNet shapes, a full quantized-forward implementation has negative
expected value (same reasoning as the parked conv fusions,
ops/pallas/__init__.py).

Shapes: the UNet's two heaviest conv layers at 256px serving
(B=64, 256x256x64 3x3 conv; B=64, 128x128x128 3x3 conv).

Usage: python benchmarks/int8_probe.py [--steps 20]

MEASURED (v5e via axon, 2026-08-18, --steps 20, B=64):
  (64,256,256,64)x(3,3,64,64):   bf16 14.86 ms (20.8 TOP/s),
                                 int8 14.01 ms (22.1 TOP/s) -> 1.06x
  (64,128,128,128)x(3,3,128,128): bf16 5.74 ms (53.9 TOP/s),
                                 int8  4.21 ms (73.4 TOP/s) -> 1.36x
VERDICT: PARKED. The UNet's dominant serving cost is the wide shallow
stem/head layers (the 256x256x64 shape), where XLA's int8 conv path is
bandwidth-bound and gains only 6%; only the deeper 128-channel layers
clear the 1.3x gate. A full PTQ int8 forward would buy well under 15%
end-to-end while adding a calibration step and quantization error —
negative expected value, same call as the parked conv fusions.
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def bench_conv(x, w, steps, preferred):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred,
        )

    out = conv(x, w)
    np.asarray(out[0, 0, 0, 0])  # compile + hard sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = conv(x, w)
    np.asarray(out[0, 0, 0, 0])
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    on_accel = jax.devices()[0].platform != "cpu"
    B = args.batch if on_accel else 2
    shapes = [
        ((B, 256, 256, 64), (3, 3, 64, 64)),
        ((B, 128, 128, 128), (3, 3, 128, 128)),
    ] if on_accel else [((B, 32, 32, 8), (3, 3, 8, 8))]

    rng = np.random.default_rng(0)
    for xs, ws in shapes:
        xf = jnp.asarray(rng.normal(size=xs), jnp.bfloat16)
        wf = jnp.asarray(rng.normal(size=ws), jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 127, xs), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, ws), jnp.int8)
        t_bf16 = bench_conv(xf, wf, args.steps, jnp.float32)
        t_int8 = bench_conv(xi, wi, args.steps, jnp.int32)
        flops = 2 * np.prod(xs) * ws[0] * ws[1] * ws[3]
        print(f"shape {xs}x{ws}: bf16 {t_bf16*1e3:.2f} ms "
              f"({flops/t_bf16/1e12:.1f} TOP/s), "
              f"int8 {t_int8*1e3:.2f} ms ({flops/t_int8/1e12:.1f} TOP/s), "
              f"speedup {t_bf16/t_int8:.2f}x")


if __name__ == "__main__":
    main()
