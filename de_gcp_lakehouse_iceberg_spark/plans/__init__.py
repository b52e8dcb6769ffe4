from .queries import ORACLE_SQL, QUERIES, register
from . import text_queries  # noqa: F401  (registers q30-q33)
from . import dedup_queries  # noqa: F401  (registers q34-q37)
from . import similarity_queries  # noqa: F401  (registers q38-q40)
from . import dml_queries  # noqa: F401  (registers q19-q21)
from . import streaming_queries  # noqa: F401  (registers q25)
from . import multimodal_queries  # noqa: F401  (registers q41-q42)
from . import window_queries  # noqa: F401  (registers q26-q28, q43)
from . import session_queries  # noqa: F401  (registers q29)
from . import corpus_queries  # noqa: F401  (registers q44)
from . import dedup_maxdf_query  # noqa: F401  (registers q46)
from . import lakehouse_queries  # noqa: F401  (registers q47-q49)
from . import pipeline_queries  # noqa: F401  (registers q50-q53)
from . import curation_queries  # noqa: F401  (registers q54-q57)
from . import clustering_queries  # noqa: F401  (registers q58)
from . import interval_queries  # noqa: F401  (registers q59)
from . import skipping_queries  # noqa: F401  (registers q60)

__all__ = ["QUERIES", "ORACLE_SQL", "register"]
