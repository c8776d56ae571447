from image_segmentation_tpu.ops import geometry  # noqa: F401
