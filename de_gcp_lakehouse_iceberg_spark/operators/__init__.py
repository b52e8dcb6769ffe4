from . import bucketing, corpus, dedup, multimodal, similarity, skew

__all__ = ["bucketing", "corpus", "dedup", "multimodal", "similarity", "skew"]
