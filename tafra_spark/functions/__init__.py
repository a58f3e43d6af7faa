from . import dedup, multimodal, pipeline, similarity, text

__all__ = ["dedup", "multimodal", "pipeline", "similarity", "text"]
