from . import bigquery_shim, text
from .text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    lang_scores,
    predict_lang,
    quality_score,
    shingles,
    stopword_hits,
    token_count,
    tokens,
    unique_token_ratio,
)

__all__ = [
    "bigquery_shim",
    "text",
    "LANG_MARKERS",
    "STOPWORDS",
    "fingerprint",
    "lang_scores",
    "predict_lang",
    "quality_score",
    "shingles",
    "stopword_hits",
    "token_count",
    "tokens",
    "unique_token_ratio",
]
