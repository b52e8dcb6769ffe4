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
  is out of scope (the helper column would join the DISTINCT key).
  Applied only to SELECT/WITH statements (DML/DDL text re-translates
  its inner SELECT); a depth-0 set op after QUALIFY is rejected with
  a clear error instead of being swallowed into the predicate
- `PERCENTILE_CONT(expr, frac) OVER (…)` (BigQuery's analytic form,
  PRD.md:853) → `percentile(expr, frac) OVER (…)` — Spark's exact
  interpolating percentile as a window aggregate, same value; the
  ANSI `WITHIN GROUP` spelling passes through unchanged
- DML text (`SqlGateway.execute`): `DELETE FROM t WHERE …`,
  `UPDATE t SET … WHERE …`, `INSERT INTO t [cols] VALUES|SELECT …`,
  and canonical `MERGE INTO … USING … ON … WHEN MATCHED THEN UPDATE
  SET … [WHEN NOT MATCHED THEN INSERT ROW]` dispatch to the lakehouse
  DML layer (atomic snapshot commits, the reference's PRD.md:769-797
  upsert/anonymize/retention statements); non-DML falls through to
  `sql()`
- DDL text (`execute`, needs `warehouse_root`): `CREATE SNAPSHOT
  TABLE new CLONE src [FOR SYSTEM_TIME AS OF ts]` (BigQuery snapshot
  syntax → `lakehouse/clone`), `CREATE [OR REPLACE] TABLE name
  [PARTITION BY col] AS SELECT …`, `TRUNCATE TABLE t` — created
  tables self-register for subsequent statements
- Metadata tables: `<table>.files` / `.snapshots` / `.partitions` /
  `.refs` / `.history` resolve to the lakehouse metadata DataFrames
  (Iceberg's metadata-table surface, `SELECT * FROM t.snapshots`)
- `EXPORT DATA OPTIONS(uri='…', format='PARQUET|JSON|ORC|CSV') AS
  SELECT …` (BigQuery's export statement) → the S14 export writers

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


def _rewrite_percentile_analytic(s: str) -> str:
    """BigQuery's analytic `PERCENTILE_CONT(expr, frac) OVER (…)`
    (PRD.md:853 Query 2's spelling) → Spark's `percentile(expr, frac)
    OVER (…)` — Spark's exact `percentile` aggregate computes the same
    linear-interpolated value and is valid as a window function. The
    ANSI one-argument `percentile_cont(f) WITHIN GROUP (ORDER BY x)`
    spelling passes through untouched (Spark executes it natively).
    A tiny scanner (not a regex) so nested parens in the value
    expression — EXTRACT(...), CAST(...) — are handled."""
    pat = re.compile(r"\bPERCENTILE_CONT\s*\(", re.IGNORECASE)
    pos = 0
    while True:
        m = pat.search(s, pos)
        if m is None:
            return s
        depth, i = 1, m.end()
        while i < len(s) and depth:
            depth += s[i] == "("
            depth -= s[i] == ")"
            i += 1
        args = s[m.end() : i - 1]
        parts = _split_top(args, ",")
        if len(parts) != 2 or not s[i:].lstrip().upper().startswith("OVER"):
            pos = m.end()
            continue
        repl = f"percentile({parts[0].strip()}, {parts[1].strip()})"
        s = s[: m.start()] + repl + s[i:]
        pos = m.start() + len(repl)


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
    # A depth-0 set operation ANYWHERE in a QUALIFY statement breaks
    # the wrap: QUALIFY binds per SELECT branch, but the helper-column
    # rewrite would filter (and * EXCEPT) the ENTIRE union — e.g.
    # `SELECT ... UNION ALL SELECT ... QUALIFY ...` silently applied
    # the predicate to both branches. Reject loudly instead (wrap the
    # QUALIFY branch in parentheses to combine it with a set op).
    # UNION/INTERSECT scan from 0 (set op before OR after QUALIFY).
    for op in ("UNION", "INTERSECT"):
        if _depth0_index(s, op) >= 0:
            raise ValueError(
                f"QUALIFY combined with a top-level {op} is not supported "
                "— parenthesize the QUALIFY branch as a subquery"
            )
    # EXCEPT also scans from 0, but BigQuery's select-list
    # `SELECT * EXCEPT (col)` spelling must not false-positive: the
    # set-op form never directly follows `*` (select-list EXCEPT
    # always does — `* EXCEPT (...)` / `t.* EXCEPT (...)`).
    frm = 0
    while (e := _depth0_index(s, "EXCEPT", frm)) >= 0:
        prev = s[:e].rstrip()
        if not prev.endswith("*"):
            raise ValueError(
                "QUALIFY combined with a top-level EXCEPT is not supported "
                "— parenthesize the QUALIFY branch as a subquery"
            )
        frm = e + 6
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
    # QUALIFY is a SELECT-clause construct: rewrite only query text.
    # Inside DML/DDL (CTAS/INSERT … SELECT … QUALIFY) the wrapper would
    # swallow the whole statement ("SELECT * EXCEPT … FROM (CREATE …)");
    # execute() re-translates the extracted inner SELECT, which is where
    # the rewrite then applies.
    if re.match(r"^(SELECT|WITH)\b", s, re.IGNORECASE):
        s = _rewrite_qualify(s)
    s = _rewrite_percentile_analytic(s)
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
    # BigQuery arr[OFFSET(k)] is 0-based; Spark SQL bracket indexing on
    # arrays is ALSO 0-based — drop the OFFSET wrapper (F25 text form)
    s = re.sub(r"\[\s*OFFSET\s*\(\s*(\d+)\s*\)\s*\]", r"[\1]", s,
               flags=re.IGNORECASE)
    # APPROX_QUANTILES(x, n) → n+1 boundary array from the SAME sketch
    # Spark's percentile_approx uses (PRD.md:4574-4586 / A8 text form;
    # literal n, non-nested value expr — the documented subset)
    s = re.sub(
        r"\bAPPROX_QUANTILES\s*\(([^()]+),\s*(\d+)\s*\)",
        lambda m: (
            f"percentile_approx({m.group(1).strip()}, array("
            + ", ".join(
                str(i / int(m.group(2))) for i in range(int(m.group(2)) + 1)
            )
            + "))"
        ),
        s,
        flags=re.IGNORECASE,
    )
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
        warehouse_root: str | None = None,
    ):
        self.spark = spark
        self.tables = tables
        self.warehouse_root = warehouse_root  # where DDL creates tables

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

    # Iceberg-style metadata tables, queryable as `<table>.<meta>`
    # (`SELECT * FROM trips.snapshots`) — the SQL face of the
    # files/snapshots/partitions/refs/history DataFrames.
    _META_VIEWS = {
        "files": "files_df",
        "snapshots": "snapshots_df",
        "partitions": "partitions_df",
        "refs": "refs_df",
        "history": "history_df",
    }

    def sql(self, text: str) -> DataFrame:
        s = translate(text)
        for name in self.tables:
            src = self.tables[name]
            if isinstance(src, LakeTable):
                for meta, attr in self._META_VIEWS.items():
                    pat = rf"\b{re.escape(name)}\.{meta}\b"
                    if re.search(pat, s):
                        view = f"{name}__{meta}"
                        getattr(src, attr)().createOrReplaceTempView(view)
                        s = re.sub(pat, view, s)
            if re.search(rf"\b{re.escape(name)}\b", s):
                df, s = self._resolve(name, s)
                df.createOrReplaceTempView(name)
        return self.spark.sql(s)

    # ------------------------------------------------------------------
    # DML statements as text — the reference's users also paste
    # BigQuery DML (PRD.md:769-797: MERGE upserts, anonymizing UPDATEs,
    # retention DELETEs). Each documented canonical shape dispatches to
    # the lakehouse DML layer (one atomic snapshot commit); everything
    # else falls through to sql(). Scalar predicates/expressions only
    # (they evaluate inside the rewrite scan) — subquery predicates
    # raise from Spark's expression parser.
    # ------------------------------------------------------------------
    _DELETE = re.compile(
        r"^DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+)$",
        re.IGNORECASE | re.DOTALL,
    )
    _UPDATE = re.compile(
        r"^UPDATE\s+(\w+)\s+SET\s+(.+)$", re.IGNORECASE | re.DOTALL
    )
    _INSERT = re.compile(
        r"^INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*"
        r"((?:SELECT|VALUES|WITH)\b.+)$",
        re.IGNORECASE | re.DOTALL,
    )
    _MERGE = re.compile(
        r"^MERGE\s+INTO\s+(\w+)(?:\s+AS)?(?:\s+(\w+))?\s+USING\s+(.+)$",
        re.IGNORECASE | re.DOTALL,
    )
    _SNAPSHOT = re.compile(
        r"^CREATE\s+SNAPSHOT\s+TABLE\s+(\w+)\s+CLONE\s+(\w+)"
        r"(?:\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?:TIMESTAMP\s+)?'([^']+)')?"
        r"\s*$",
        re.IGNORECASE,
    )
    _CTAS = re.compile(
        r"^CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(\w+)\s*"
        r"(?:PARTITION\s+BY\s+(\w+)\s+)?AS\s+(.+)$",
        re.IGNORECASE | re.DOTALL,
    )
    _TRUNCATE = re.compile(
        r"^TRUNCATE\s+TABLE\s+(\w+)\s*$", re.IGNORECASE
    )
    _EXPORT = re.compile(
        r"^EXPORT\s+DATA\s+OPTIONS\s*\(\s*uri\s*=\s*'([^']+)'\s*,\s*"
        r"format\s*=\s*'(PARQUET|JSON|JSONL|ORC|CSV)'\s*"
        r"(?:,\s*overwrite\s*=\s*(true|false)\s*)?\)\s*AS\s+(.+)$",
        re.IGNORECASE | re.DOTALL,
    )

    def _lake(self, name: str) -> LakeTable:
        t = self.tables.get(name)
        if not isinstance(t, LakeTable):
            raise ValueError(f"DML target {name!r} must be a LakeTable")
        return t

    def execute(self, text: str):
        """Run one statement: DML returns the committed Snapshot,
        anything else returns sql(text)'s DataFrame."""
        from .lakehouse import dml

        s = translate(text)
        m = self._SNAPSHOT.match(s)
        if m:
            return self._create_snapshot(m.group(1), m.group(2), m.group(3))
        m = self._CTAS.match(s)
        if m:
            return self._ctas(
                bool(m.group(1)), m.group(2), m.group(3), m.group(4)
            )
        m = self._TRUNCATE.match(s)
        if m:
            return dml.delete(self._lake(m.group(1)), F.lit(True))
        m = self._EXPORT.match(s)
        if m:
            uri, fmt, ow, sel = m.groups()
            df = self.sql(sel)
            from .sources import ingest as _ing

            # BigQuery's overwrite option defaults to FALSE: absent or
            # 'false' must refuse to clobber an existing destination
            # (errorifexists), not silently overwrite.
            mode = (
                "overwrite"
                if ow is not None and ow.lower() == "true"
                else "errorifexists"
            )
            writer = {
                "PARQUET": _ing.export_parquet,
                "JSON": _ing.export_jsonl,
                "JSONL": _ing.export_jsonl,
                "ORC": _ing.export_orc,
            }.get(fmt.upper())
            if writer is None:  # CSV has no helper: plain writer
                df.write.mode(mode).option("header", True).csv(uri)
            else:
                writer(df, uri, mode=mode)
            return df
        m = self._DELETE.match(s)
        if m:
            return dml.delete(self._lake(m.group(1)), m.group(2).strip())
        m = self._UPDATE.match(s)
        if m:
            body = m.group(2)
            w = _depth0_index(body, "WHERE")
            if w < 0:
                raise ValueError("UPDATE requires a WHERE clause")
            assigns = _parse_assignments(body[:w])
            return dml.update(
                self._lake(m.group(1)), assigns, body[w + 5 :].strip()
            )
        m = self._INSERT.match(s)
        if m:
            name, cols, src = m.group(1), m.group(2), m.group(3).strip()
            lake = self._lake(name)
            if src.upper().startswith("VALUES"):
                if not cols:
                    raise ValueError(
                        "INSERT … VALUES needs an explicit column list"
                    )
                col_list = ", ".join(
                    c.strip() for c in cols.split(",")
                )
                df = self.spark.sql(
                    f"SELECT * FROM ({src}) AS _v({col_list})"
                )
            else:
                df = self.sql(src)
                if cols:
                    df = df.toDF(*[c.strip() for c in cols.split(",")])
            lake.append(df)
            return lake.snapshot()
        m = self._MERGE.match(s)
        if m:
            return self._merge(m.group(1), m.group(2), m.group(3))
        return self.sql(text)

    def _ddl_root(self, name: str) -> str:
        import os

        if not self.warehouse_root:
            raise ValueError(
                "DDL needs SqlGateway(warehouse_root=…) to place new tables"
            )
        return os.path.join(self.warehouse_root, name)

    def _create_snapshot(
        self, new: str, src: str, asof: str | None
    ) -> LakeTable:
        """BigQuery `CREATE SNAPSHOT TABLE new CLONE src [FOR
        SYSTEM_TIME AS OF ts]` → lakehouse snapshot clone (verbatim
        file copy with stats/blooms carried — `lakehouse/clone.py`)."""
        from .lakehouse.clone import clone_table

        dst = clone_table(
            self._lake(src),
            self._ddl_root(new),
            as_of_ms=_parse_ts_ms(asof) if asof else None,
        )
        self.tables[new] = dst
        return dst

    def _ctas(
        self, replace: bool, name: str, part_col: str | None, select: str
    ) -> LakeTable:
        """`CREATE [OR REPLACE] TABLE name [PARTITION BY col] AS
        SELECT …`. PARTITION BY takes a plain column of the projection
        (materialize derived partition columns in the SELECT — the
        lakehouse layer's hidden transforms cover the DATE(ts) cases
        programmatically)."""
        df = self.sql(select)
        existing = self.tables.get(name)
        if isinstance(existing, LakeTable):
            if not replace:
                raise ValueError(f"table {name!r} exists — use OR REPLACE")
            existing.overwrite(df)
            return existing
        if existing is not None and not replace:
            raise ValueError(f"table {name!r} exists — use OR REPLACE")
        t = LakeTable.create(
            self.spark,
            self._ddl_root(name),
            partition_by=[part_col] if part_col else None,
        )
        t.append(df)
        self.tables[name] = t
        return t

    def _merge(self, target: str, tgt_alias: str | None, rest: str):
        """Canonical MERGE shape: USING (name | (subquery)) [AS] alias
        ON t.k = s.k [AND …] WHEN MATCHED THEN UPDATE SET a = expr, …
        [WHEN NOT MATCHED THEN INSERT ROW]. Insert semantics are
        whole-source-row (the dml layer's contract); a column-list
        INSERT must be the identity projection of the source."""
        from .lakehouse import dml

        lake = self._lake(target)
        rest = rest.strip()
        src_alias = None
        if rest.startswith("("):
            depth, i = 0, 0
            for i, ch in enumerate(rest):
                depth += ch == "("
                depth -= ch == ")"
                if depth == 0:
                    break
            source_df = self.sql(rest[1:i])
            rest = rest[i + 1 :].strip()
        else:
            mm = re.match(r"^(\w+)", rest)
            src_name = mm.group(1)
            src = self.tables[src_name]
            source_df = src.scan() if isinstance(src, LakeTable) else src
            rest = rest[mm.end() :].strip()
            src_alias = src_name  # a bare name is its own alias
        am = re.match(r"^(?:AS\s+)?(\w+)\s+(?=ON\b)", rest, re.IGNORECASE)
        if am:
            src_alias = am.group(1)
            rest = rest[am.end() :].strip()
        tgt_alias = tgt_alias or target  # likewise for the target
        if src_alias and tgt_alias and src_alias == tgt_alias:
            raise ValueError(
                "MERGE target and source aliases must be distinct "
                f"(both are {src_alias!r})"
            )
        if not rest.upper().startswith("ON"):
            raise ValueError("MERGE needs an ON clause")
        rest = rest[2:].strip()
        w = _depth0_index(rest, "WHEN")
        if w < 0:
            raise ValueError("MERGE needs at least one WHEN clause")
        on_text, clauses = rest[:w], rest[w:]

        # Canonical-alias rewrite in ONE pass (a single alternation with
        # a callback): sequential substitution would corrupt statements
        # whose aliases collide with the canonical names — e.g.
        # `MERGE INTO trips AS s USING src AS t` rewrote target refs
        # into source refs (t. → source.) after s. → t. had run.
        alias_map = {}
        if tgt_alias:
            alias_map[tgt_alias] = "t"
        if src_alias:
            alias_map[src_alias] = "source"
        alias_pat = (
            re.compile(
                r"\b("
                + "|".join(re.escape(a) for a in alias_map)
                + r")\."
            )
            if alias_map
            else None
        )

        def _strip_alias(expr: str) -> str:
            if alias_pat is None:
                return expr.strip()
            return alias_pat.sub(
                lambda m: alias_map[m.group(1)] + ".", expr
            ).strip()

        on_cols = []
        for part in _split_top(on_text, "AND"):
            eq = [x.strip() for x in part.split("=")]
            if len(eq) != 2:
                raise ValueError(f"MERGE ON supports equi-joins: {part!r}")
            names = {x.split(".")[-1].strip() for x in eq}
            if len(names) != 1:
                raise ValueError(
                    "MERGE ON columns must share a name on both sides "
                    f"(got {part!r}) — alias the source projection first"
                )
            on_cols.append(names.pop())

        update_set: dict[str, str] | None = None
        insert = False
        um = re.search(
            r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.*?)"
            r"(?=WHEN\s+NOT\s+MATCHED|$)",
            clauses,
            re.IGNORECASE | re.DOTALL,
        )
        if um:
            update_set = {
                k.split(".")[-1].strip(): _strip_alias(v)
                for k, v in (
                    a.split("=", 1) for a in _split_top(um.group(1), ",")
                )
            }
        im = re.search(
            r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*(ROW|\(.*)?$",
            clauses,
            re.IGNORECASE | re.DOTALL,
        )
        if im:
            spec = (im.group(1) or "ROW").strip()
            if spec.upper() != "ROW":
                cm = re.match(
                    r"^\(([^)]*)\)\s*VALUES\s*\(([^)]*)\)\s*$",
                    spec,
                    re.DOTALL,
                )
                ok = cm is not None and all(
                    c.strip() == v.strip().split(".")[-1]
                    for c, v in zip(
                        cm.group(1).split(","), cm.group(2).split(",")
                    )
                )
                if not ok:
                    raise ValueError(
                        "MERGE INSERT must be ROW or the identity "
                        "projection of the source — reshape the source "
                        "subquery instead"
                    )
            insert = True
        return dml.merge(
            lake,
            source_df,
            on=on_cols,
            when_matched_update=update_set,
            when_not_matched_insert=insert,
        )


def _split_top(s: str, sep: str) -> list[str]:
    """Split on a separator at paren-depth 0 outside string literals
    (sep is a word like AND or a single char like ,)."""
    out, depth, in_str, last, i = [], 0, False, 0, 0
    up, w = s.upper(), sep.upper()
    while i < len(s):
        ch = s[i]
        if in_str:
            in_str = ch != "'"
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and up.startswith(w, i) and (
            not w.isalpha()
            or (
                (i == 0 or not up[i - 1].isalnum())
                and (
                    i + len(w) >= len(s) or not up[i + len(w)].isalnum()
                )
            )
        ):
            out.append(s[last:i])
            i += len(w)
            last = i
            continue
        i += 1
    out.append(s[last:])
    return [p for p in out if p.strip()]


def _parse_assignments(text: str) -> dict[str, str]:
    out = {}
    for part in _split_top(text, ","):
        k, v = part.split("=", 1)
        out[k.strip()] = v.strip()
    return out
