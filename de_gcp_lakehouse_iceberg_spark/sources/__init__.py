from . import generator, ingest, taxi_schema

__all__ = ["generator", "ingest", "taxi_schema"]
