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
        # Pin DuckDB's TimeZone: with ICU loaded, TIMESTAMPTZ→TIMESTAMP
        # renderings (e.g. to_timestamp(x)::TIMESTAMP) follow the
        # process TZ env — the engine's convention (and the driver's
        # observed behavior across four rounds of green timestamp
        # queries) is UTC everywhere.
        try:
            con.execute("SET TimeZone='UTC'")
        except Exception:  # noqa: BLE001 — no ICU ⇒ already UTC
            pass
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


def _norm(v, local_naive: bool = False):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        # Compare TIMESTAMP columns as INSTANTS: PySpark's classic
        # collect() renders TimestampType in the PROCESS-local timezone
        # while the oracle (and an Arrow/session-tz collection, which
        # is what the driver's behavior matches) renders UTC — same
        # instant, different wall-clock strings under a non-UTC TZ env.
        # local_naive=True marks values from an instant column of a
        # Spark collect: reinterpret as local time, convert to UTC.
        # TIMESTAMP_NTZ columns are wall-clock by definition and
        # compare verbatim (local_naive=False). Identical under TZ=UTC.
        if local_naive and v.tzinfo is None:
            v = v.astimezone(_dt.timezone.utc)
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc)
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def canonical(
    cols: list[str],
    rows: list[tuple],
    instant_cols: set[str] | None = None,
) -> list[tuple]:
    """Sort columns by name (driver convention), normalize values, sort
    rows. `instant_cols` names the columns whose naive datetimes are
    process-local renderings of instants (Spark TimestampType collect
    output) — they are converted to UTC; everything else (oracle
    output, TIMESTAMP_NTZ) compares verbatim."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    inst = instant_cols or set()
    out = [
        tuple(_norm(r[i], cols[i] in inst) for i in order) for r in rows
    ]
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

    from pyspark.sql.types import TimestampType

    instant_cols = {
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, TimestampType)
    }
    sc = canonical(s_cols, s_rows, instant_cols=instant_cols)
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
