"""Pallas TPU kernels — with the measured keep/park decision per kernel.

The reference has no native kernels at all (SURVEY.md §2.3: 100% stock
PyTorch ops); cuDNN played the fused-kernel role implicitly. Here each
candidate fusion was built, validated against the pure-XLA path, and
benchmarked on real v5e hardware. Honest results, including the losses,
and the resulting production decision:

| Kernel | Shapes (bf16, v5e) | vs XLA | Decision |
|---|---|---|---|
| `attention.fused_attention` | ViT-B/16: B=32, 197 tok, 12 heads | **1.33×** (+27% ClipUNet e2e) | **KEEP — on by default** on TPU (`use_pallas`) |
| `mlp.fused_mlp` (ln2→fc1→quick-GELU→fc2→+x) | ViT-B/16: 6304 tok, 768→3072→768, tile 128 | **1.065×** kernel-level (tile sweep: 256→0.94×, 512→1.05×, 1024→0.59×); e2e ClipUNet neutral (train 491 vs 490 img/s, infer 1198 vs 1201 — within noise) | **KEEP — opt-in** via `use_pallas_mlp` (default follows `use_pallas`; lane-aligned dims only) |
| `double_conv.fused_double_conv` (conv3×3+BN+ReLU ×2, BN folded) | UNet 256×256×64 | 1.02–1.03× (parity) | **PARK** — validated reference; XLA stays the default conv path |
| `blocks.down_block` / `up_block` (XLA pre-stage + fused double-conv) | UNet levels | parity | **PARK** with double-conv |
| fully-fused UNet inference (`models/fused_unet.py`) | 256px UNet | 0.51× | **PARK** — XLA's cross-layer fusion wins; kept as a validated artifact |
| patch-embed fusion | ViT-B/16 stem | not built | **PARK** — the 16×16/s16 conv is 0.23 GFLOP/img (~1.3% of the ViT); XLA already lowers it as one matmul, no fusion to win |
| training-path double-conv fwd/bwd (unfolded BN) | — | not built | **PARK** — the inference kernel (no batch-stat reduction, the easier problem) only reaches XLA parity, so a training variant with cross-program stat reductions has negative expected value; measured evidence over aspiration |

Why the conv fusions lose on TPU: XLA's conv emitter already fuses BN
scale/bias and ReLU into conv epilogues and pipelines HBM↔VMEM for
overlapping row-strips; a Pallas strip-halo kernel re-reads the halo rows
and gives up XLA's cross-layer scheduling. The transformer-side fusions
win because XLA will not fuse *across* two matmuls — keeping the
(tokens, 3072) intermediate and the (S, S) score matrix in VMEM is a
real structural advantage.

All kernels are differentiable (custom VJP recomputing through the XLA
reference) and tested in interpret mode on CPU against the XLA path
(tests/test_pallas.py)."""
