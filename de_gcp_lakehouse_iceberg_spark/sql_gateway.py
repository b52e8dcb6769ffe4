"""SQL-text gateway — run the reference's BigQuery-dialect SQL
verbatim against this engine.

The reference's users don't call a DataFrame API; they paste SQL
(`scripts/verify_loaded_data.sql`, the README.md:546-607 analytics
examples, PRD dashboard queries). This module closes that last
switching gap: `SqlGateway.sql(text)` accepts the BigQuery dialect,
rewrites the documented deltas to Spark SQL, registers the referenced
tables (plain DataFrames or LakeTables — including `FOR SYSTEM_TIME`
time travel and `_CHANGE_TYPE` change history against the lakehouse
layer), and hands the text to `spark.sql` — Catalyst plans it like
any other query.

Dialect deltas handled (each mirrors a construct that appears in the
reference's documented query set):

- `` `project.dataset.table` `` → bare table name
- `DATE_TRUNC(expr, UNIT)` (BigQuery arg order) → `date_trunc('UNIT', expr)`
- `TIMESTAMP_SUB/ADD(e, INTERVAL n U)` → `e - INTERVAL n U` / `+`
- `DATE_SUB/ADD(e, INTERVAL n U)` → same interval arithmetic
- `TIMESTAMP_DIFF(a, b, U)` → `timestampdiff(U, b, a)` (note the
  argument swap: BigQuery returns a−b)
- `COUNTIF(p)` → `count_if(p)`; `SAFE_DIVIDE(a, b)` → `try_divide(a, b)`
- `FORMAT_DATE('%A', d)` → `date_format(d, 'EEEE')` (day-name pattern,
  the one the reference uses)
- `FOR SYSTEM_TIME AS OF '<ts>'` → LakeTable time-travel scan
  registered as the view for that table (Iceberg `AS OF` semantics)
- `FOR SYSTEM_TIME BETWEEN '<a>' AND '<b>'` → the lakehouse changelog
  between the snapshots bracketing [a, b], with `_CHANGE_TYPE` /
  `_CHANGE_TIMESTAMP` exposed under their BigQuery names
- `QUALIFY <window predicate>` (BigQuery's dedup/top-k idiom, e.g.
  `QUALIFY ROW_NUMBER() OVER (...) = 1`) → the predicate is computed
  as a helper column inside a wrapping subquery, filtered outside,
  and dropped via `SELECT * EXCEPT` — Spark has no QUALIFY clause.
  One top-level QUALIFY per statement; `SELECT DISTINCT ... QUALIFY`
  is out of scope (the helper column would join the DISTINCT key)

Constructs Spark already accepts unchanged (DATE(x), CURRENT_DATE(),
EXTRACT(.. FROM ..), GROUP BY / HAVING on select aliases) pass
through untouched — the translator is deliberately minimal and
documented, not a SQL parser.
"""

from __future__ import annotations

import datetime as _dt
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lakehouse import LakeTable

_BACKTICK = re.compile(r"`(?:[A-Za-z0-9_$&{}().-]+\.)*([A-Za-z0-9_]+)`")
_DTRUNC = re.compile(
    r"\b(DATE_TRUNC|TIMESTAMP_TRUNC)\s*\(\s*([^,()]+?)\s*,\s*"
    r"(MICROSECOND|MILLISECOND|SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|QUARTER|YEAR)"
    r"\s*\)",
    re.IGNORECASE,
)
_TS_ARITH = re.compile(
    r"\b(TIMESTAMP_SUB|TIMESTAMP_ADD|DATE_SUB|DATE_ADD)\s*\(\s*"
    r"(.+?)\s*,\s*INTERVAL\s+(\d+)\s+"
    r"(SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|QUARTER|YEAR)\s*\)",
    re.IGNORECASE,
)
_TS_DIFF = re.compile(
    r"\bTIMESTAMP_DIFF\s*\(\s*([^,]+?)\s*,\s*([^,]+?)\s*,\s*"
    r"(SECOND|MINUTE|HOUR|DAY)\s*\)",
    re.IGNORECASE,
)
_SYSTEM_TIME_AS_OF = re.compile(
    r"\bFOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?:TIMESTAMP\s+)?'([^']+)'",
    re.IGNORECASE,
)
_SYSTEM_TIME_BETWEEN = re.compile(
    r"\bFOR\s+SYSTEM_TIME\s+BETWEEN\s+(?:TIMESTAMP\s+)?'([^']+)'\s+AND\s+"
    r"(?:TIMESTAMP\s+)?'([^']+)'",
    re.IGNORECASE,
)
_FORMAT_DATE = re.compile(
    r"\bFORMAT_DATE\s*\(\s*'%A'\s*,\s*([^()]+?)\s*\)", re.IGNORECASE
)
_DATE_DIFF = re.compile(
    r"\bDATE_DIFF\s*\(\s*([^,]+?)\s*,\s*([^,]+?)\s*,\s*DAY\s*\)",
    re.IGNORECASE,
)


def _depth0_index(s: str, word: str, start: int = 0) -> int:
    """Index of the first whole-word, paren-depth-0, non-quoted
    occurrence of `word` (upper-cased match) at/after `start`; -1 if
    none."""
    depth = 0
    in_str = False
    up = s.upper()
    w = word.upper()
    i = start
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and up.startswith(w, i)
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (
                i + len(w) >= len(s)
                or not (s[i + len(w)].isalnum() or s[i + len(w)] == "_")
            )
        ):
            return i
        i += 1
    return -1


def _rewrite_qualify(s: str) -> str:
    """BigQuery `QUALIFY <window pred>` → wrap: compute the predicate
    as a helper column inside a subquery, filter on it outside, and
    drop it with `* EXCEPT`. Handles one top-level QUALIFY (the
    reference's dedup/top-k idiom, e.g.
    `QUALIFY ROW_NUMBER() OVER (...) = 1`); QUALIFY inside a
    parenthesized subquery is recursed into by the caller re-running
    translate on that text. ORDER BY / LIMIT after the QUALIFY stay on
    the outer query, where select-list aliases still resolve through
    `*`."""
    q = _depth0_index(s, "QUALIFY")
    if q < 0:
        return s
    # Predicate runs until a top-level ORDER BY / LIMIT or end-of-text.
    tail_at = len(s)
    for kw in ("ORDER", "LIMIT"):
        j = _depth0_index(s, kw, q + 7)
        if j >= 0:
            tail_at = min(tail_at, j)
    pred = s[q + 7 : tail_at].strip()
    tail = s[tail_at:].strip()
    head = s[:q].rstrip()
    # Insert the helper column just before the main SELECT's FROM —
    # the first depth-0 FROM (CTE bodies are parenthesized).
    f = _depth0_index(head, "FROM")
    if f < 0:
        return s
    inner = (
        head[:f].rstrip()
        + f", ({pred}) AS __qualify__ "
        + head[f:]
    )
    out = (
        "SELECT * EXCEPT (__qualify__) FROM ("
        + inner
        + ") WHERE __qualify__"
    )
    if tail:
        out += " " + tail
    return out


def translate(sql: str) -> str:
    """BigQuery dialect → Spark SQL (text-level, documented subset)."""
    s = sql.strip().rstrip(";")
    s = _BACKTICK.sub(r"\1", s)
    s = _rewrite_qualify(s)
    s = _DTRUNC.sub(lambda m: f"date_trunc('{m.group(3).upper()}', {m.group(2)})", s)
    s = _TS_ARITH.sub(
        lambda m: (
            f"({m.group(2)} "
            f"{'-' if m.group(1).upper().endswith('SUB') else '+'} "
            f"INTERVAL {m.group(3)} {m.group(4).upper()})"
        ),
        s,
    )
    s = _TS_DIFF.sub(
        lambda m: f"timestampdiff({m.group(3).upper()}, {m.group(2)}, {m.group(1)})",
        s,
    )
    s = _FORMAT_DATE.sub(lambda m: f"date_format({m.group(1)}, 'EEEE')", s)
    # BigQuery DATE_DIFF(a, b, DAY) = a − b in days → Spark datediff(a, b)
    s = _DATE_DIFF.sub(lambda m: f"datediff({m.group(1)}, {m.group(2)})", s)
    s = re.sub(r"\bCOUNTIF\s*\(", "count_if(", s, flags=re.IGNORECASE)
    s = re.sub(r"\bSAFE_DIVIDE\s*\(", "try_divide(", s, flags=re.IGNORECASE)
    # BigQuery type spellings → Spark SQL types. NUMERIC(p,s) keeps its
    # parameters; bare NUMERIC is BigQuery's fixed DECIMAL(38,9).
    s = re.sub(r"\bFLOAT64\b", "DOUBLE", s, flags=re.IGNORECASE)
    s = re.sub(r"\bINT64\b", "BIGINT", s, flags=re.IGNORECASE)
    s = re.sub(r"\bNUMERIC\s*\(", "DECIMAL(", s, flags=re.IGNORECASE)
    s = re.sub(r"\bNUMERIC\b", "DECIMAL(38,9)", s, flags=re.IGNORECASE)
    return s


def _parse_ts_ms(s: str) -> int:
    v = _dt.datetime.fromisoformat(s)
    if v.tzinfo is None:
        v = v.replace(tzinfo=_dt.timezone.utc)
    return int(v.timestamp() * 1000)


class SqlGateway:
    """Resolve table names against a mix of DataFrames and LakeTables
    and execute translated BigQuery-dialect SQL."""

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, "DataFrame | LakeTable"],
    ):
        self.spark = spark
        self.tables = tables

    def _resolve(self, name: str, sql: str) -> tuple[DataFrame, str]:
        """The view to register for `name`, honoring a FOR SYSTEM_TIME
        clause only when it IMMEDIATELY FOLLOWS this table's own
        reference (`FROM t FOR SYSTEM_TIME …`) — a clause attached to a
        different table in the same query is left untouched for that
        table's own resolution pass. Returns
        (df, sql-with-this-table's-clause-stripped)."""
        src = self.tables[name]
        esc = re.escape(name)
        bet = re.compile(
            rf"\b{esc}\b\s+" + _SYSTEM_TIME_BETWEEN.pattern,
            re.IGNORECASE,
        )
        asof = re.compile(
            rf"\b{esc}\b\s+" + _SYSTEM_TIME_AS_OF.pattern,
            re.IGNORECASE,
        )
        m = bet.search(sql)
        if m is not None:
            if not isinstance(src, LakeTable):
                raise ValueError(
                    f"FOR SYSTEM_TIME on {name!r} needs a LakeTable"
                )
            from .lakehouse import dml

            lo = src.snapshot_as_of(_parse_ts_ms(m.group(1)))
            hi = src.snapshot_as_of(_parse_ts_ms(m.group(2)))
            df = (
                dml.changelog(src, lo.version, hi.version)
                # rename (not add) — Spark's case-insensitive resolver
                # would see an added _CHANGE_TYPE as a duplicate
                .withColumnRenamed("_change_type", "_CHANGE_TYPE")
                .withColumn(
                    "_change_timestamp",
                    F.to_timestamp(F.col("_change_timestamp") / 1000),
                )
                .withColumnRenamed("_change_timestamp", "_CHANGE_TIMESTAMP")
            )
            stripped = bet.sub(name, sql, count=1)
            self._reject_second_clause(name, bet, asof, stripped)
            return df, stripped
        m = asof.search(sql)
        if m is not None:
            if not isinstance(src, LakeTable):
                raise ValueError(
                    f"FOR SYSTEM_TIME on {name!r} needs a LakeTable"
                )
            df = src.scan(as_of_ms=_parse_ts_ms(m.group(1)))
            stripped = asof.sub(name, sql, count=1)
            self._reject_second_clause(name, bet, asof, stripped)
            return df, stripped
        df = src.scan() if isinstance(src, LakeTable) else src
        return df, sql

    @staticmethod
    def _reject_second_clause(name, bet, asof, stripped: str) -> None:
        # one registered view per name: the SAME table at two different
        # system times in one statement can't both bind to it
        if bet.search(stripped) or asof.search(stripped):
            raise ValueError(
                f"table {name!r} appears with more than one FOR "
                "SYSTEM_TIME clause — register it under two names to "
                "join a table to its own history"
            )

    def sql(self, text: str) -> DataFrame:
        s = translate(text)
        for name in self.tables:
            if re.search(rf"\b{re.escape(name)}\b", s):
                df, s = self._resolve(name, s)
                df.createOrReplaceTempView(name)
        return self.spark.sql(s)
