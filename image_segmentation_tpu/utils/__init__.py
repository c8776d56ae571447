from image_segmentation_tpu.utils.profiling import (
    StepTimer,
    enable_compilation_cache,
    enable_nan_checks,
    trace_context,
)

__all__ = [
    "StepTimer",
    "trace_context",
    "enable_nan_checks",
    "enable_compilation_cache",
]
