from . import dml, evolution, maintenance, metrics
from .table import CommitConflict, LakeTable, Snapshot
from .views import Warehouse

__all__ = [
    "CommitConflict",
    "LakeTable",
    "Snapshot",
    "Warehouse",
    "dml",
    "evolution",
    "maintenance",
    "metrics",
]
