from .table import LakeTable, Snapshot

__all__ = ["LakeTable", "Snapshot"]
