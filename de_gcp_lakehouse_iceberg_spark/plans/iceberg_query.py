"""q117 — Iceberg binary round-trip under the driver hash gate: build
a lakehouse table from orders, run copy-on-write AND merge-on-read
DML plus a post-delete append, export the spec-v2 mirror (real Avro
manifests, position-delete parquet), then READ THE TABLE BACK through
`iceberg_reader.read_iceberg` — the spec files alone, never the
engine's manifests — and aggregate the result.

The hash therefore covers the whole format loop: Appendix-C Avro
manifest encoding, sequence-number semantics (the MOR delete must
kill rows in both original and CoW-rewritten files, but NOT in the
later append), position-delete materialization (`pos_delete_rows` is
read from the delete manifest via the independent OCF decoder and
must equal the oracle's count of logically deleted rows), the
reader's delete application, AND schema evolution (r11 task #8): an
ALTER TABLE ADD COLUMN lands mid-lifecycle, so the spec read spans
manifests with MIXED schemas — pre-evolution files must surface the
new column as NULL while the post-evolution append carries values,
checked by `chan_cnt` (non-null count per group).

Reference parity anchor: `table_format = 'ICEBERG'`
(sql/create_iceberg_tables.sql:27-28) — interoperating through the
open format is the point of that choice.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable, avro, dml, evolution
from ..lakehouse.iceberg_export import export_iceberg_metadata
from ..lakehouse.iceberg_reader import read_iceberg
from ..tables import table
from .queries import register
from .workdir import scratch

_ROOT = scratch("lakehouse_iceberg_query")
_COW = "o_orderkey % 4 = 1"
_MOR = "o_custkey % 9 = 2"
_LATE = "o_orderkey % 13 = 5"


@register(
    "q117_iceberg_roundtrip",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders),
    kept AS (
      SELECT * FROM base
      WHERE NOT ({_COW}) AND NOT ({_MOR})),
    final AS (
      SELECT *, CAST(NULL AS VARCHAR) AS o_channel FROM kept
      UNION ALL
      SELECT *, 'backfill' AS o_channel FROM base WHERE {_LATE}),
    scalars AS (
      SELECT CAST((SELECT count(*) FROM base
                   WHERE NOT ({_COW}) AND ({_MOR})) AS BIGINT)
               AS pos_delete_rows,
             CAST(1 AS BIGINT) AS delete_manifests)
    SELECT f.o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt,
           floor(CAST(sum(CAST(f.o_totalprice AS DECIMAL(18,6)))
                      AS DOUBLE) * 100 + 0.5) / 100 AS price_sum,
           CAST(min(f.o_orderkey) AS BIGINT) AS min_key,
           CAST(max(f.o_orderkey) AS BIGINT) AS max_key,
           CAST(count(f.o_channel) AS BIGINT) AS chan_cnt,
           s.pos_delete_rows,
           s.delete_manifests
    FROM final f CROSS JOIN scalars s
    GROUP BY f.o_orderpriority, s.pos_delete_rows, s.delete_manifests
    ORDER BY f.o_orderpriority
    """,
)
def q117_iceberg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    root = os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)

    t = LakeTable.create(spark, root)
    t.append(orders.coalesce(2), operation="load")
    dml.delete(t, _COW)  # copy-on-write rewrite (bumps file seqs)
    dml.delete_mor(t, _MOR)  # predicate delete → position-delete files
    # ALTER TABLE ADD COLUMN mid-lifecycle: the export now spans
    # manifests with two schemas; pre-evolution files read o_channel
    # as NULL through the spec reader, the late append carries values
    evolution.add_column(t, "o_channel", "string")
    # Partition-spec evolution mid-lifecycle (r12 VERDICT #7): the
    # table starts unpartitioned and switches to a bucket spec before
    # the late append, so the export emits MULTI-SPEC metadata
    # (partition-specs [spec0, spec1], default-spec-id 1, per-manifest
    # partition-spec-id = the spec in force at that snapshot) and the
    # reader consumes manifests whose r102 partition structs differ —
    # all under the same hash gate (metadata-only evolution must not
    # change a single value).
    evolution.set_partition_spec(t, ["bucket(4, o_orderkey)"])
    t.append(
        orders.filter(F.expr(_LATE)).withColumn(
            "o_channel", F.lit("backfill")
        ),
        operation="late_arrivals",
    )

    mpath = export_iceberg_metadata(t, spark=spark)

    # format proof, via the INDEPENDENT Avro decoder: exactly one
    # content=1 delete manifest, whose position-delete rows equal the
    # logically deleted row count (the oracle recomputes it from the
    # predicates)
    head = t.current_version()
    _, _, manifests = avro.read_ocf(
        os.path.join(t.root, "iceberg", f"snap-{head}.manifest-list.avro")
    )
    dels = [m for m in manifests if m["content"] == 1]
    pos_delete_rows = 0
    for m in dels:
        _, _, entries = avro.read_ocf(m["manifest_path"])
        pos_delete_rows += sum(
            e["data_file"]["record_count"] for e in entries
        )

    back = read_iceberg(spark, mpath)  # spec files only
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            (
                F.floor(
                    F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                    .cast("double")
                    * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("price_sum"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.count("o_channel").alias("chan_cnt"),
        )
        .withColumn("pos_delete_rows", F.lit(pos_delete_rows).cast("long"))
        .withColumn("delete_manifests", F.lit(len(dels)).cast("long"))
        .orderBy("o_orderpriority")
    )
