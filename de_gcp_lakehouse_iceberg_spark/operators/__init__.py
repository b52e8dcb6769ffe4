from . import bucketing, corpus, dedup, multimodal, packing, sampling, similarity, skew

__all__ = ["bucketing", "corpus", "dedup", "multimodal", "packing", "sampling", "similarity", "skew"]
