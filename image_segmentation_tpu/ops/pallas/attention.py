"""Fused multi-head attention kernel (Pallas TPU).

The CLIP ViT's attention (197 tokens × 12 heads, reference
clip/clipunet.py:43 via HF CLIPVisionModel) is small enough that the
whole (S, S) score matrix of one (batch, head) pair fits comfortably in
VMEM, so the profitable fusion is simply: one kernel per (batch, head)
computing softmax(QKᵀ/√d)·V with the scores never touching HBM — three
MXU matmuls and a VPU softmax back to back.

Sequence is padded to a lane-aligned length; padded KEY positions are
masked to −∞ before the softmax (padded QUERY rows produce garbage that
the caller slices off). Accumulation in float32 regardless of input
dtype.

Falls back to the pure-XLA einsum path in models/clip_vit.py when
disabled; `interpret=True` (CPU) tests pin the two paths together.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float):
    """All heads of one batch element per program: (H, Sp, Dp) blocks,
    batched MXU matmuls over the head dimension."""
    # Matmul inputs stay in their storage dtype (bf16 on TPU — full MXU
    # rate); accumulation is float32 via preferred_element_type.
    q = q_ref[0]  # (H, Sp, Dp)
    k = k_ref[0]
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (H, Sp, Sp) float32

    sp = logits.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    logits = jnp.where(col < seq_len, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, interpret: bool = False):
    """softmax(QKᵀ/√D)·V for (B, S, H, D) tensors, one fused kernel per
    batch element (all heads batched on the MXU). Returns (B, S, H, D) in
    q's dtype.

    Differentiable: the backward pass recomputes through the pure-XLA
    reference (flash-style recompute — no residuals besides q/k/v), so
    the kernel composes with jax.grad even though pallas_call itself has
    no autodiff rule (needed because linearization traverses the frozen
    encoder even under stop_gradient)."""
    return _fused_attention_impl(q, k, v, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_attention_impl(q, k, v, interpret: bool = False):
    b, s, h, d = q.shape
    # Minimal tile-legal padding: dim -2 needs sublane alignment (16 covers
    # bf16 and f32); dim -1 may equal the (padded-to-lane-legal) array dim.
    sp = _round_up(s, 16)
    dp = d  # block dim == array dim is always tile-legal; padding D would
    # only add dead FLOPs to both matmuls

    # (B, S, H, D) -> (B, H, Sp, Dp): the last two block dims must be
    # tile-aligned, so heads move ahead of the sequence.
    def prep(t):
        t = jnp.transpose(t, (0, 2, 1, 3))
        return jnp.pad(t, [(0, 0), (0, 0), (0, sp - s), (0, dp - d)])

    qp, kp, vp = prep(q), prep(k), prep(v)

    spec = pl.BlockSpec(
        (1, h, sp, dp),
        lambda bi: (bi, 0, 0, 0),
        memory_space=pl.ANY if interpret else pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(
            _attention_kernel, seq_len=s, scale=1.0 / (d**0.5)
        ),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sp, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return jnp.transpose(out[:, :, :s, :d], (0, 2, 1, 3))


def reference_attention(q, k, v):
    """Pure-XLA reference (same math as models/clip_vit.py)."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (d**0.5)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _fused_attention_fwd(q, k, v, interpret):
    return _fused_attention_impl(q, k, v, interpret), (q, k, v)


def _fused_attention_bwd(interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(reference_attention, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
