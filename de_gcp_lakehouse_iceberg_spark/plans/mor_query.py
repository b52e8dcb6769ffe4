"""q80 — merge-on-read delete lifecycle under the driver's hash gate:
load → MOR delete (metadata-only) → post-delete append (must NOT be
retro-deleted) → materialize. The row carries file counts before/after
and per-stage scan aggregates, so both the logical filtering AND the
zero-data-movement property are inside the hash.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable
from ..lakehouse.dml import delete_mor, materialize_deletes
from ..tables import table
from .queries import _dsum, _r, register
from .workdir import scratch

_ROOT = scratch("lakehouse_mor_query")


@register(
    "q80_mor_delete_lifecycle",
    oracle="""
    SELECT
      CAST((SELECT count(*) FROM orders) AS BIGINT) AS loaded_rows,
      CAST((SELECT count(*) FROM orders WHERE NOT coalesce(
            o_orderstatus = 'F', FALSE)) AS BIGINT) AS after_mor_rows,
      CAST(1 AS BIGINT) AS delete_file_delta,
      CAST((SELECT count(*) FROM orders WHERE o_orderstatus <> 'F')
           + (SELECT count(*) FROM orders WHERE o_orderkey % 10 = 3)
           AS BIGINT) AS after_append_rows,
      (SELECT floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                    AS DOUBLE) * 100 + 0.5) / 100
       FROM (SELECT o_totalprice FROM orders WHERE o_orderstatus <> 'F'
             UNION ALL
             SELECT o_totalprice FROM orders WHERE o_orderkey % 10 = 3))
        AS final_price_sum,
      CAST(0 AS BIGINT) AS deletes_after_materialize
    """,
)
def q80_mor_delete_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    root = os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)

    t = LakeTable.create(spark, root)
    t.append(orders.coalesce(2), operation="load")
    loaded_rows = t.scan().count()
    files_before = len(t.snapshot().files)

    delete_mor(t, "o_orderstatus = 'F'")
    after_mor_rows = t.scan().count()
    # metadata-only proof: file count unchanged by the delete commit
    delete_file_delta = (
        1 if len(t.snapshot().files) == files_before else 0
    )

    # rows matching the predicate appended AFTER the delete must live
    t.append(
        orders.filter(F.col("o_orderkey") % 10 == 3).coalesce(1),
        operation="late_append",
    )
    after_append_rows = t.scan().count()
    price = t.scan().agg(
        _r(_dsum("o_totalprice", scale=6), 2).alias("s")
    ).collect()[0]["s"]

    materialize_deletes(t)
    deletes_after = len(t.snapshot().deletes)

    return spark.createDataFrame(
        [
            (
                loaded_rows,
                after_mor_rows,
                delete_file_delta,
                after_append_rows,
                price,
                deletes_after,
            )
        ],
        "loaded_rows long, after_mor_rows long, delete_file_delta long, "
        "after_append_rows long, final_price_sum double, "
        "deletes_after_materialize long",
    )
