"""View layer for a LakeTable warehouse — logical views (D7:
CREATE [OR REPLACE] VIEW, e.g. the taxi_trips_v1 compat projection
sql/create_iceberg_tables.sql:146-167 and daily_zone_stats :170-184)
and materialized views with scheduled refresh (D8: PRD.md:882-902's
60-minute-refresh MV → an idempotently refreshed lakehouse table,
since Spark has no MV primitive — SURVEY.md §7.3 item 7).

View definitions are SQL text stored in `_views.json` at the warehouse
root; resolution registers every base table as a temp view and runs the
SQL through Catalyst — views compose and optimize like any other query.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable

VIEWS_FILE = "_views.json"


class Warehouse:
    """A directory of LakeTables + named view definitions."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    # -- tables --------------------------------------------------------
    def table_root(self, name: str) -> str:
        return os.path.join(self.root, name)

    def create_table(self, name: str, **kwargs) -> LakeTable:
        return LakeTable.create(self.spark, self.table_root(name), **kwargs)

    def table(self, name: str) -> LakeTable:
        return LakeTable.load(self.spark, self.table_root(name))

    def table_names(self) -> list[str]:
        out = []
        for d in sorted(os.listdir(self.root)):
            if os.path.isdir(os.path.join(self.root, d, "_manifests")):
                out.append(d)
        return out

    # -- logical views (D7) --------------------------------------------
    def _views(self) -> dict[str, dict[str, Any]]:
        try:
            with open(os.path.join(self.root, VIEWS_FILE)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def create_view(self, name: str, sql: str, replace: bool = True) -> None:
        views = self._views()
        if name in views and not replace:
            raise ValueError(f"view {name!r} exists (use replace=True)")
        views[name] = {"sql": sql, "updated_ms": int(time.time() * 1000)}
        with open(os.path.join(self.root, VIEWS_FILE), "w") as f:
            json.dump(views, f, indent=2)

    def view_names(self) -> list[str]:
        return sorted(self._views())

    def _register_bases(self) -> None:
        for t in self.table_names():
            try:
                self.table(t).scan().createOrReplaceTempView(t)
            except ValueError:
                pass  # empty table with no schema yet (e.g. a fresh MV)

    def query_view(self, name: str) -> DataFrame:
        views = self._views()
        if name not in views:
            raise KeyError(f"no view {name!r}")
        self._register_bases()
        # register other views first so views can reference views
        for other, spec in views.items():
            if other != name:
                try:
                    self.spark.sql(spec["sql"]).createOrReplaceTempView(other)
                except Exception:
                    pass  # view over a not-yet-existing base — skip
        return self.spark.sql(views[name]["sql"])

    def sql(self, query: str) -> DataFrame:
        """Ad-hoc SQL over every table and view in the warehouse."""
        self._register_bases()
        for name, spec in self._views().items():
            try:
                self.spark.sql(spec["sql"]).createOrReplaceTempView(name)
            except Exception:
                pass
        return self.spark.sql(query)

    # -- materialized views (D8) ---------------------------------------
    def create_materialized_view(
        self, name: str, sql: str, refresh_minutes: float = 60.0
    ) -> LakeTable:
        """MV = view definition + a backing table refreshed idempotently
        (full overwrite — the snapshot layer keeps history; per-partition
        incremental refresh is the 100 TB upgrade path and slots into
        `refresh` unchanged)."""
        self.create_view(f"_mv_def_{name}", sql)
        views = self._views()
        views[f"_mv_def_{name}"]["refresh_minutes"] = refresh_minutes
        with open(os.path.join(self.root, VIEWS_FILE), "w") as f:
            json.dump(views, f, indent=2)
        t = self.create_table(name)
        self.refresh_materialized_view(name)
        return self.table(name)

    def refresh_materialized_view(self, name: str) -> None:
        df = self.query_view(f"_mv_def_{name}")
        self.table(name).overwrite(df)

    def stale_materialized_views(self, now_ms: int | None = None) -> list[str]:
        """MVs whose backing table is older than their refresh interval —
        the scheduler (maintenance CLI) refreshes exactly these."""
        now_ms = now_ms or int(time.time() * 1000)
        out = []
        for vname, spec in self._views().items():
            if not vname.startswith("_mv_def_"):
                continue
            name = vname[len("_mv_def_") :]
            interval_ms = spec.get("refresh_minutes", 60.0) * 60_000
            last = self.table(name).snapshot().timestamp_ms
            if now_ms - last >= interval_ms:
                out.append(name)
        return sorted(out)
