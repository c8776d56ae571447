"""CLIP ViT vision encoder in pure JAX/linen (frozen feature extractor).

Reimplements the behavior of HF `CLIPVisionModel`
("openai/clip-vit-base-patch16") as consumed by the reference
(clip/clipunet.py:7-65): patch-embed conv (k=s=patch, no bias), learned
class + position embeddings, pre-layernorm, 12 pre-norm transformer
blocks (hidden 768, 12 heads, MLP 3072, quick-GELU), and the list of
per-layer hidden states — hidden_states[0] is the pre-layernorm output
and hidden_states[i] the output of block i, so the reference's
skip_indices [3, 5, 7, 9] select block outputs 3/5/7/9. The bottleneck
is the raw block-12 output (HF applies post_layernorm only to the CLS
pooled vector, not the sequence).

TPU-first notes: the 197-token sequence is tiny, so attention runs as
batched MXU matmuls via einsum (a Pallas fused-attention path plugs in
via `ops.pallas.attention` when enabled); everything is static-shape and
the whole (frozen) encoder sits under one jit with stop_gradient at its
outputs so autodiff never enters it.

Weights convert offline from the HF torch checkpoint
(`convert_hf_vision_state_dict`); no network access at train time.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    layer_norm_eps: float = 1e-5

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size**2


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    """Standard scaled-dot-product MHA (q/k/v/out projections with bias)."""

    cfg: ClipViTConfig
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype, name=name)
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], c.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        if self.use_pallas:
            import jax as _jax

            from image_segmentation_tpu.ops.pallas.attention import fused_attention

            # interpret mode on CPU so tests exercise the same kernel
            # (positional: custom_vjp rejects keyword args)
            out = fused_attention(q, k, v, _jax.default_backend() == "cpu")
        else:
            scale = 1.0 / np.sqrt(head_dim)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            probs = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(out.shape[0], out.shape[1], c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(out)


class _DenseParams(nn.Module):
    """Parameter-only stand-in for nn.Dense: same param names ('kernel',
    'bias'), same initializers, NO compute — so the fused-MLP kernel path
    produces an identical parameter tree (and identical init values) to
    the XLA path, keeping checkpoints interchangeable."""

    in_features: int
    features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (self.in_features, self.features),
            self.param_dtype,
        )
        b = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )
        return k, b


class _LayerNormParams(nn.Module):
    """Parameter-only stand-in for nn.LayerNorm ('scale', 'bias')."""

    features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        s = self.param(
            "scale", nn.initializers.ones_init(), (self.features,),
            self.param_dtype,
        )
        b = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )
        return s, b


class TransformerBlock(nn.Module):
    """Pre-norm block: x + attn(ln1(x)); x + mlp(ln2(x)); quick-GELU MLP.

    With `use_pallas` the MLP half (ln2→fc1→quick-GELU→fc2→+x) runs as
    one fused Pallas kernel (ops/pallas/mlp.py) when the dims are
    lane-aligned; the parameter tree is identical either way."""

    cfg: ClipViTConfig
    dtype: Any = jnp.float32
    use_pallas: bool = False
    use_pallas_mlp: Optional[bool] = None  # None -> follow use_pallas

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name=name
        )
        x = x + MultiHeadAttention(c, self.dtype, self.use_pallas, name="attn")(
            ln("ln1")(x)
        )
        fuse_mlp = (
            self.use_pallas if self.use_pallas_mlp is None else self.use_pallas_mlp
        )
        if fuse_mlp and c.hidden_size % 128 == 0 and c.mlp_dim % 128 == 0:
            import jax as _jax

            from image_segmentation_tpu.ops.pallas.mlp import fused_mlp

            lns, lnb = _LayerNormParams(c.hidden_size, name="ln2")()
            w1, b1 = _DenseParams(c.hidden_size, c.mlp_dim, name="fc1")()
            w2, b2 = _DenseParams(c.mlp_dim, c.hidden_size, name="fc2")()
            return fused_mlp(
                x.astype(self.dtype),
                lns, lnb, w1.astype(self.dtype), b1,
                w2.astype(self.dtype), b2,
                c.layer_norm_eps, _jax.default_backend() == "cpu",
            )
        h = ln("ln2")(x)
        h = nn.Dense(c.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class ClipViT(nn.Module):
    """Vision transformer returning (last_hidden, all_hidden_states).

    last_hidden: (N, 1+P, H) raw final block output.
    hidden_states: tuple of (N, 1+P, H); [0] = embeddings after
    pre-layernorm, [i] = output of block i.
    """

    cfg: ClipViTConfig = ClipViTConfig()
    dtype: Any = jnp.float32
    use_pallas: bool = False
    use_pallas_mlp: Optional[bool] = None

    @nn.compact
    def __call__(self, pixels) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        c = self.cfg
        n = pixels.shape[0]
        if pixels.shape[1] != c.image_size or pixels.shape[2] != c.image_size:
            raise ValueError(
                f"ClipViT expects {c.image_size}px inputs, got "
                f"{pixels.shape[1]}x{pixels.shape[2]} "
                "(the reference warns here; we make it a hard error)"
            )
        x = pixels.astype(self.dtype)
        patches = nn.Conv(
            c.hidden_size,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(x)  # (N, G, G, H)
        patches = patches.reshape(n, c.num_patches, c.hidden_size)

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=0.02),
            (c.hidden_size,),
        ).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (n, 1, c.hidden_size))
        seq = jnp.concatenate([cls, patches], axis=1)  # (N, 1+P, H)

        pos = self.param(
            "position_embedding",
            nn.initializers.normal(stddev=0.02),
            (c.num_patches + 1, c.hidden_size),
        ).astype(self.dtype)
        seq = seq + pos[None]

        seq = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="pre_layernorm"
        )(seq)

        hidden_states = [seq]
        for i in range(c.num_layers):
            seq = TransformerBlock(
                c, self.dtype, self.use_pallas, self.use_pallas_mlp,
                name=f"block_{i}",
            )(seq)
            hidden_states.append(seq)
        return seq, hidden_states


def tokens_to_grid(tokens: jnp.ndarray, grid: int) -> jnp.ndarray:
    """(N, 1+G², H) → (N, G, G, H): drop CLS, reshape to the spatial grid
    (reference clip/clipunet.py:48-51, NHWC instead of NCHW)."""
    return tokens[:, 1:, :].reshape(tokens.shape[0], grid, grid, tokens.shape[-1])


# ---------------------------------------------------------------------------
# HF checkpoint conversion (offline, one-time)
# ---------------------------------------------------------------------------

def convert_hf_vision_state_dict(state_dict) -> dict:
    """Map an HF CLIPVisionModel torch state_dict onto ClipViT params.

    Accepts tensors or numpy arrays; returns a nested dict suitable as
    {'params': ...} for ClipViT.apply. Linear weights transpose from
    torch (out, in) to flax (in, out); the patch conv transposes from
    OIHW to HWIO.
    """
    sd = {
        k.replace("vision_model.", ""): np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
        for k, v in state_dict.items()
    }

    def lin(prefix):
        return {
            "kernel": sd[prefix + ".weight"].T,
            "bias": sd[prefix + ".bias"],
        }

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    params = {
        "patch_embedding": {
            "kernel": sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
        },
        "class_embedding": sd["embeddings.class_embedding"],
        "position_embedding": sd["embeddings.position_embedding.weight"],
        "pre_layernorm": ln("pre_layrnorm"),  # (sic — HF's typo'd name)
    }
    n_layers = (
        max(
            int(k.split(".")[2])
            for k in sd
            if k.startswith("encoder.layers.")
        )
        + 1
    )
    for i in range(n_layers):
        p = f"encoder.layers.{i}"
        params[f"block_{i}"] = {
            "ln1": ln(p + ".layer_norm1"),
            "ln2": ln(p + ".layer_norm2"),
            "attn": {
                "q_proj": lin(p + ".self_attn.q_proj"),
                "k_proj": lin(p + ".self_attn.k_proj"),
                "v_proj": lin(p + ".self_attn.v_proj"),
                "out_proj": lin(p + ".self_attn.out_proj"),
            },
            "fc1": lin(p + ".mlp.fc1"),
            "fc2": lin(p + ".mlp.fc2"),
        }
    return params


def load_pretrained_clip_params(
    model_name: str = "openai/clip-vit-base-patch16",
    cache_path: str | None = None,
):
    """Load + convert pretrained CLIP vision weights.

    Tries a local converted-params file first (cache_path, .npz), then the
    HF hub cache (no download in a zero-egress environment — raises with
    a clear message if neither is available).
    """
    if cache_path:
        import os

        if os.path.exists(cache_path):
            loaded = np.load(cache_path, allow_pickle=True)
            import flax

            return flax.traverse_util.unflatten_dict(
                {tuple(k.split("/")): v for k, v in loaded.items()}
            )
    try:
        from transformers import CLIPVisionModel

        model = CLIPVisionModel.from_pretrained(model_name, local_files_only=True)
        return convert_hf_vision_state_dict(model.state_dict())
    except Exception as e:
        raise RuntimeError(
            f"No local CLIP weights available ({e}). Convert offline with "
            "convert_hf_vision_state_dict and pass cache_path, or run with "
            "random initialisation."
        ) from e
