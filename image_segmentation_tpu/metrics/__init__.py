from image_segmentation_tpu.metrics.confusion import (
    MetricsHistory,
    confusion_counts,
    confusion_counts_masked,
    metrics_from_counts,
)

__all__ = [
    "MetricsHistory",
    "confusion_counts",
    "confusion_counts_masked",
    "metrics_from_counts",
]
