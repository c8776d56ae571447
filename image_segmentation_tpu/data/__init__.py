from image_segmentation_tpu.data.labels import (
    calculate_class_weights,
    convert_rgb_label_to_classes,
    target_remap,
)

__all__ = [
    "calculate_class_weights",
    "convert_rgb_label_to_classes",
    "target_remap",
]
