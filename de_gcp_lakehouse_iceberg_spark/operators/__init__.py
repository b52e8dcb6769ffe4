from . import dedup

__all__ = ["dedup"]
