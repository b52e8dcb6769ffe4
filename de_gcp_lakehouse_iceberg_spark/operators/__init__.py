from . import dedup, multimodal, similarity, skew

__all__ = ["dedup", "multimodal", "similarity", "skew"]
