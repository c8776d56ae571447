from image_segmentation_tpu.serve.engine import InferenceEngine, ModelEntry

__all__ = ["InferenceEngine", "ModelEntry"]
