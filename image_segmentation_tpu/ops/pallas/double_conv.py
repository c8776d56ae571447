"""Fused double-conv kernel (Pallas TPU): [conv3×3 → BN → ReLU] × 2.

The reference's universal building block (unet/unet.py:4-25 and every
decoder). XLA already fuses BN+ReLU into conv epilogues; what it cannot
do is keep the INTERMEDIATE activation between the two convolutions out
of HBM. This kernel processes one row-strip per program with both convs
back to back, the conv1 result living only in registers/VMEM.

Implementation notes (shaped by this environment's Mosaic compiler,
which rejects manual HBM→VMEM DMA kernels):
  * overlapping halo reads are expressed with TWO standard VMEM views of
    the row-padded input — view A at block s and view B at block s+1 —
    whose concatenation holds the strip plus its 4-row halo (the input
    is padded by `strip` rows so block s+1 always exists);
  * each 3×3 conv is 9 shifted (rows·width, Cin)×(Cin, Cout) MXU
    matmuls with float32 accumulation; column shifts are cyclic
    `pltpu.roll`s at the full (lane-aligned) padded width — the wrapped
    columns land in the masked halo;
  * conv2's 'SAME' zero padding is enforced by masking the intermediate
    outside the image before the second conv;
  * BatchNorm is pre-folded into per-channel scale/bias via `fold_bn`
    (inference semantics — the training path stays on XLA convs).

Validated against the XLA reference in interpret mode (tests) and on
hardware.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(
    conv_bias: Optional[jnp.ndarray],
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(scale, bias) with y = conv(x)·scale + bias ≡ BN(conv(x)+b)."""
    inv = bn_scale / jnp.sqrt(bn_var + eps)
    b = conv_bias if conv_bias is not None else 0.0
    return inv, (b - bn_mean) * inv + bn_bias


def _shift_cols(a, dx: int, wp: int):
    """a[:, j] ← a[:, j+dx], zero-filling the vacated right columns.
    (pltpu.roll on the sublane axis crashes this Mosaic version; a static
    slice + concat lowers cleanly and the zero fill is exactly the conv
    padding semantics for the halo columns.)"""
    if dx == 0:
        return a
    zeros = jnp.zeros(a.shape[:1] + (dx,) + a.shape[2:], a.dtype)
    return jnp.concatenate([a[:, dx:], zeros], axis=1)


def _dc_kernel(
    xa_ref,  # (1, strip, Wp, Cin) rows [s·strip, (s+1)·strip) of padded x
    xb_ref,  # (1, strip, Wp, Cin) rows [(s+1)·strip, (s+2)·strip)
    w1_ref,  # (9, Cin, C)
    s1_ref,  # (1, C) float32
    b1_ref,
    w2_ref,  # (9, C, C)
    s2_ref,
    b2_ref,
    out_ref,  # (1, strip, W, C)
    *,
    strip: int,
    width: int,
):
    s = pl.program_id(1)
    r0 = s * strip
    wp = xa_ref.shape[2]
    cin = xa_ref.shape[3]
    c = w1_ref.shape[-1]

    # strip + 4 halo rows of the padded input
    x = jnp.concatenate([xa_ref[0], xb_ref[0, :4]], axis=0)

    rows1 = strip + 2
    acc1 = jnp.zeros((rows1 * wp, c), jnp.float32)
    for dy in range(3):
        rows = x[dy : dy + rows1]
        for dx in range(3):
            patch = _shift_cols(rows, dx, wp)
            acc1 = acc1 + jax.lax.dot_general(
                patch.reshape(rows1 * wp, cin),
                w1_ref[dy * 3 + dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    mid = jnp.maximum(acc1 * s1_ref[0] + b1_ref[0], 0.0)
    mid = mid.reshape(rows1, wp, c)
    # conv2 must see ZERO padding, not the intermediate evaluated outside
    # the image: mid[mi, mj] is original (r0+mi−1, mj−1).
    total_rows = pl.num_programs(1) * strip
    shape3 = (rows1, wp, c)
    grow = jax.lax.broadcasted_iota(jnp.int32, shape3, 0) + r0 - 1
    gcol = jax.lax.broadcasted_iota(jnp.int32, shape3, 1) - 1
    inside = (grow >= 0) & (grow < total_rows) & (gcol >= 0) & (gcol < width)
    mid = jnp.where(inside, mid, 0.0).astype(x.dtype)

    acc2 = jnp.zeros((strip * wp, c), jnp.float32)
    for dy in range(3):
        rows = mid[dy : dy + strip]
        for dx in range(3):
            patch = _shift_cols(rows, dx, wp)
            acc2 = acc2 + jax.lax.dot_general(
                patch.reshape(strip * wp, c),
                w2_ref[dy * 3 + dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out = jnp.maximum(acc2 * s2_ref[0] + b2_ref[0], 0.0)
    out_ref[0] = out.reshape(strip, wp, c)[:, :width, :].astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("strip", "interpret"))
def fused_double_conv(
    x: jnp.ndarray,  # (N, H, W, Cin)
    w1: jnp.ndarray,  # (3, 3, Cin, C)
    scale1: jnp.ndarray,  # (C,)
    bias1: jnp.ndarray,
    w2: jnp.ndarray,  # (3, 3, C, C)
    scale2: jnp.ndarray,
    bias2: jnp.ndarray,
    strip: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    n, h, w, cin = x.shape
    c = w1.shape[-1]

    # Tiny channel counts (the RGB stem, cin=3) crash this environment's
    # Mosaic lowering despite being tile-legal; zero-pad the input channels
    # and the matching w1 rows — mathematically identical.
    if cin < 8:
        pad_c = 8 - cin
        x = jnp.pad(x, [(0, 0)] * 3 + [(0, pad_c)])
        w1 = jnp.pad(w1, [(0, 0), (0, 0), (0, pad_c), (0, 0)])
        cin = 8

    wp = _round_up(w + 4, 16)  # lane-legal padded width (covers bf16)

    # strip=0 → auto-size so the VMEM working set (two input views, the
    # halo'd intermediate, f32 accumulators, double-buffered blocks) stays
    # within budget; large strips overflow as an opaque compile failure
    # (strip 32 already does at 256px/64ch). Hardware benchmark: parity
    # with XLA's conv path (1.02-1.03x) at 256x256x64 bf16 — the value is
    # the fused single-pass structure, not a speedup.
    if strip == 0:
        bytes_in = 2 if x.dtype == jnp.bfloat16 else 4
        per_row = wp * (3 * cin * bytes_in + c * (8 + bytes_in))
        strip = 16
        while strip > 4 and strip * per_row > 4_000_000:
            strip //= 2
        while h % strip and strip > 1:
            strip //= 2
        strip = max(strip, 4) if h % 4 == 0 else strip
    assert h % strip == 0 and strip >= 4, (h, strip)

    # rows: 2-row halo on top, then enough bottom padding that the total is
    # h + strip — so view B (block s+1) exists for the last strip; cols:
    # 2-col halo then zero-fill to the lane-legal width.
    xp = jnp.pad(x, [(0, 0), (2, strip - 2), (2, wp - w - 2), (0, 0)])

    def flat(wk):
        return wk.reshape(9, wk.shape[2], wk.shape[3]).astype(x.dtype)

    view = lambda off: pl.BlockSpec(
        (1, strip, wp, cin),
        lambda ni, si, off=off: (ni, si + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_dc_kernel, strip=strip, width=w),
        grid=(n, h // strip),
        in_specs=[view(0), view(1), vspec(), vspec(), vspec(), vspec(),
                  vspec(), vspec()],
        out_specs=pl.BlockSpec(
            (1, strip, w, c), lambda ni, si: (ni, si, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        interpret=interpret,
    )(
        xp,
        xp,
        flat(w1),
        scale1.reshape(1, c).astype(jnp.float32),
        bias1.reshape(1, c).astype(jnp.float32),
        flat(w2),
        scale2.reshape(1, c).astype(jnp.float32),
        bias2.reshape(1, c).astype(jnp.float32),
    )
    return out


def reference_double_conv(x, w1, scale1, bias1, w2, scale2, bias2):
    """Pure-XLA reference: conv→scale/bias→relu twice."""

    def conv(v, k):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    y = jnp.maximum(conv(x, w1) * scale1 + bias1, 0.0).astype(x.dtype)
    return jnp.maximum(conv(y, w2) * scale2 + bias2, 0.0).astype(x.dtype)
