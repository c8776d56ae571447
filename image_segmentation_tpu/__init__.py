"""image_segmentation_tpu — a TPU-native semantic-segmentation framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of the
reference PyTorch project (in5omnia/Image_Segmentation): U-Net,
autoencoder-pretrained segmentation, frozen-CLIP-ViT U-Net decoders, and
prompt-based interactive segmentation on Oxford-IIIT Pet — redesigned
TPU-first:

- NHWC tensor layout everywhere (TPU-native convolution layout).
- All compute (models, losses, metrics, image geometry, augmentation)
  runs under `jax.jit` with static shapes; variable-size images are
  handled by batched per-image scale-and-translate resampling instead of
  the reference's per-image Python loops (reference
  utils/utils.py:77-115).
- Data parallelism via `jax.sharding.Mesh` + NamedSharding; gradient
  accumulation is a `lax.scan` microbatch loop (reference
  utils/training.py:49-56 simulated batch 64 on batch-2 hardware).
- Pallas TPU kernels for the fused hot ops, with pure-XLA fallbacks.
- Orbax checkpointing with best-val-mIoU selection mirroring reference
  utils/training.py:453-618.
"""

__version__ = "0.1.0"

NUM_CLASSES = 4  # background, cat, dog, boundary (reference notebooks cell 0)
EVAL_IGNORE_INDEX = 3  # boundary excluded from eval metrics
