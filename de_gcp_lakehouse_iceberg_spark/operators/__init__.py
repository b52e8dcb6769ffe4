from . import dedup, similarity

__all__ = ["dedup", "similarity"]
