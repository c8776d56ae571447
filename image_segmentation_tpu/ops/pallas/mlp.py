"""Fused ViT MLP kernel (Pallas TPU): ln2 → fc1 → quick-GELU → fc2 → +x.

The CLIP ViT transformer block's second half (reference HF
CLIPVisionModel consumed at clip/clipunet.py:43; our pure-JAX
reimplementation models/clip_vit.py:100-113). XLA runs fc1 and fc2 as
two separate matmuls with the (tokens, mlp_dim) intermediate — 4× wider
than the hidden size — round-tripping through HBM between them, plus
separate layernorm/GELU/residual passes. This kernel tiles the token
dimension and keeps BOTH weight matrices resident in VMEM across the
grid (≈9.4 MB in bf16 for the ViT-B/16 768→3072→768 shapes), so per
token-tile the entire chain runs out of VMEM and the intermediate never
touches HBM.

Shape contract: hidden and mlp dims must be lane-aligned (multiples of
128 — ViT-B/16's 768/3072 are); callers fall back to the XLA path
otherwise. The token count is padded to the tile size; padded rows
compute garbage that is sliced off (LayerNorm of an all-zero row is
finite: variance 0 → rsqrt(eps)).

Differentiable the same way as ops/pallas/attention.py: a custom VJP
whose backward recomputes through the pure-XLA reference, so the kernel
composes with jax.grad (pallas_call has no autodiff rule, and
linearization traverses the frozen encoder even under stop_gradient).

Measured (TPU v5e, bf16, ViT-B/16 shapes: B=32 → 6304 tokens,
768→3072→768, token tile 128): 1.30 ms vs XLA 1.38 ms — **1.065×**,
a small real win (both run ~40 TFLOP/s, latency-limited at this token
count). End-to-end on ClipUNet the op is too small a slice to move the
needle: train 491 vs 490 img/s (B=32), infer 1198 vs 1201 img/s (B=64)
— within run-to-run noise both ways. Kept as an opt-in fusion via the
models' `use_pallas_mlp` flag (default follows `use_pallas`); see the
keep/park table in ops/pallas/__init__.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 128 measured fastest on v5e at ViT-B/16 shapes (see benchmarks/
# mlp_kernel_bench.py sweep: 128 -> 1.065x XLA, 256 -> 0.94x,
# 512 -> 1.05x, 1024 -> 0.59x).
TOKEN_TILE = int(__import__("os").environ.get("ISTPU_MLP_TILE", "128"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mlp_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    """Pure-XLA reference: x + fc2(quick_gelu(fc1(ln(x)))). Math mirrors
    models/clip_vit.py:109-113 (LayerNorm stats in f32, quick-GELU)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    h = h.astype(x.dtype)
    h = jnp.dot(h, w1, preferred_element_type=jnp.float32) + b1.astype(
        jnp.float32
    )
    h = h * jax.nn.sigmoid(1.702 * h)  # quick-GELU in f32
    h = h.astype(x.dtype)
    y = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.astype(
        jnp.float32
    )
    return x + y.astype(x.dtype)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, eps: float):
    x = x_ref[:]  # (TM, H) storage dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * lns_ref[0:1, :].astype(jnp.float32) + lnb_ref[0:1, :].astype(jnp.float32)
    h = h.astype(x.dtype)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0:1, :].astype(jnp.float32)
    h = h * jax.nn.sigmoid(1.702 * h)
    h = h.astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[0:1, :].astype(jnp.float32)
    o_ref[:] = x + y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2,
              eps: float = 1e-5, interpret: bool = False):
    """x: (B, S, H); weights as in nn.Dense ((in, out) kernels). Returns
    x + MLP(LN(x)) in x's dtype. H and mlp_dim must be multiples of 128
    (the ViT-B/16 shapes are); otherwise use the XLA path."""
    return _fused_mlp_impl(x, ln_scale, ln_bias, w1, b1, w2, b2,
                           eps, interpret)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _fused_mlp_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret):
    b, s, hdim = x.shape
    fdim = w1.shape[1]
    if hdim % 128 != 0 or fdim % 128 != 0:
        raise ValueError(
            f"fused_mlp needs lane-aligned dims, got H={hdim} F={fdim}"
        )
    m = b * s
    mp = _round_up(m, TOKEN_TILE)
    xt = x.reshape(m, hdim)
    if mp != m:
        xt = jnp.pad(xt, ((0, mp - m), (0, 0)))

    # broadcast 1-D vectors to sublane-aligned 2-D rows for VMEM blocks
    row = lambda v: jnp.broadcast_to(v[None, :], (8, v.shape[0]))

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        grid=(mp // TOKEN_TILE,),
        in_specs=[
            pl.BlockSpec((TOKEN_TILE, hdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, fdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, fdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fdim, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TOKEN_TILE, hdim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, hdim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * hdim * fdim * 2,
            bytes_accessed=(mp * hdim * 2 + hdim * fdim * 2) * 2,
            transcendentals=mp * fdim,
        ),
        interpret=interpret,
    )(xt, row(ln_scale), row(ln_bias), w1, row(b1), w2, row(b2))
    return out[:m].reshape(b, s, hdim)


def _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, interpret):
    out = _fused_mlp_impl(x, ln_scale, ln_bias, w1, b1, w2, b2,
                          eps, interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _bwd(eps, interpret, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _mlp_reference(*a, eps), x, ln_scale, ln_bias,
        w1, b1, w2, b2,
    )
    return vjp(g)


fused_mlp.defvjp(_fwd, _bwd)
