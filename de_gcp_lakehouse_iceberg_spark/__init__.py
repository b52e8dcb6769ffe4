"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference GCP lakehouse (wayneweicheng/de_gcp_lakehouse_iceberg).

Brand-new Spark-first implementation: DataFrame/SQL plans optimized by
Catalyst, a lightweight snapshot-versioned parquet table layer (the
Iceberg-capability surface: ACID append, time travel, MERGE/UPDATE/DELETE,
compaction, snapshot expiry), Structured Streaming ingest, and
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
