from image_segmentation_tpu.models.unet import UNet
from image_segmentation_tpu.models.autoencoder import (
    ReconstructionAutoencoder,
    SegmentationAutoencoder,
)

__all__ = [
    "UNet",
    "ReconstructionAutoencoder",
    "SegmentationAutoencoder",
]
