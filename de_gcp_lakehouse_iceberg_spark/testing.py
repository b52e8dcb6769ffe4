"""Local replica of the driver's correctness gate: run a registered
query through Spark AND its DuckDB oracle on the same parquet tables,
then compare row count + column names + values order-insensitively.

Used by tests/ so that failures surface locally before the driver's
per-round CORRECTNESS check.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from .tables import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def canonical(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver convention), normalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare_query(spark, sf_dir: str, name: str) -> tuple[bool, str]:
    """Run queries()[name] on Spark and oracle_sql()[name] on DuckDB;
    return (match, message)."""
    from .plans import ORACLE_SQL, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLE_SQL:
        return (len(s_rows) >= 0, f"rows-only: {len(s_rows)} rows")

    o_cols, o_rows = run_oracle(ORACLE_SQL[name], sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        return (False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        return (False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")

    sc = canonical(s_cols, s_rows)
    oc = canonical(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(sc, oc)):
        if a != b:
            # pinpoint first diverging cell
            for j, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    col = sorted(s_cols)[j]
                    return (
                        False,
                        f"value mismatch at sorted-row {i} col {col!r}: "
                        f"spark={x!r} oracle={y!r}",
                    )
            return (False, f"row mismatch at sorted-row {i}: {a} vs {b}")
    return (True, f"OK: {len(s_rows)} rows")
