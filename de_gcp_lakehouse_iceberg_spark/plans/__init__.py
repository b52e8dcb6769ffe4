from .queries import ORACLE_SQL, QUERIES, register

__all__ = ["QUERIES", "ORACLE_SQL", "register"]
