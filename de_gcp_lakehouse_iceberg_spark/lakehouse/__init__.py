from . import dml, evolution, maintenance, metrics
from .table import LakeTable, Snapshot
from .views import Warehouse

__all__ = [
    "LakeTable",
    "Snapshot",
    "Warehouse",
    "dml",
    "evolution",
    "maintenance",
    "metrics",
]
