"""q81 — multimodal resize proof: per-document synthetic raw-RGB
images (byte i = (doc_id·31 + i·7) mod 256, dims derived from doc_id)
are nearest-neighbor resized by `operators.multimodal.resize_media`
(mapInPandas, Arrow-batched numpy gather) to a fixed 4x3 thumbnail,
then checksummed. The DuckDB oracle never materializes any payload: it
recomputes each output byte PURELY from index arithmetic —
src = (x·W//4, y·H//3), idx = 3·(src_y·W + src_x) + c, value =
(doc_id·31 + idx·7) mod 256 — so a resize that misindexes rows,
columns, channels, or the floor division breaks the hash.

Reference surface: the multimodal preprocessing a training-data
pipeline runs ahead of ingestion (SURVEY.md §7.1 step 10); resize for
compressed containers is the documented codec stub, exercised by
tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..operators.multimodal import MEDIA_SCHEMA, resize_media
from ..tables import SPREAD_MIN_ROWS, _measured_splits, spread, table, table_rows
from .queries import register

_W = "8 + doc_id % 5"   # source width  in [8, 12]
_H = "6 + doc_id % 4"   # source height in [6, 9]
_W2, _H2 = 4, 3         # thumbnail dims


def _raw_media(docs: DataFrame) -> DataFrame:
    """Deterministic raw_rgb payload per doc_id (numpy, Arrow batches):
    the stand-in for a decode stage's output."""

    def _gen(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 5, 6 + d % 4
                idx = np.arange(w * h * 3, dtype=np.int64)
                payload = ((d * 31 + idx * 7) % 256).astype(np.uint8)
                out["media_id"].append(d)
                out["kind"].append("raw_rgb")
                out["payload"].append(payload.tobytes())
                out["meta"].append(
                    {"width": w, "height": h, "sample_rate": None,
                     "n_bytes": w * h * 3}
                )
            if out["media_id"]:
                yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(_gen, schema=MEDIA_SCHEMA)


@F.pandas_udf(LongType())
def _byte_sum(payload):  # type: ignore[no-untyped-def]
    import numpy as np

    return payload.map(
        lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
        if b is not None
        else 0
    )


@register(
    "q81_media_resize",
    oracle=f"""
    WITH px AS (
      SELECT d.doc_id, d.source,
             (d.doc_id * 31
              + (3 * (((y * ({_H})) // {_H2}) * ({_W})
                      + ((x * ({_W})) // {_W2})) + c) * 7) % 256 AS v
      FROM documents d,
           unnest(range({_H2})) AS ty(y),
           unnest(range({_W2})) AS tx(x),
           unnest(range(3)) AS tc(c))
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_imgs,
           CAST(count(*) AS BIGINT) AS n_bytes,
           CAST(sum(v) AS BIGINT) AS byte_sum
    FROM px
    GROUP BY source
    ORDER BY source
    """,
)
def q81_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The generator consumes ONLY doc_id, so spreading the full
    # documents scan ahead of it is pure overhead (the r13 normalized
    # drift, 2.7x at gate scale) — when the fan-out pays at all, fan
    # the NARROW key projection out instead: the exchange ships longs
    # only, and the heavy stage (payload synthesis + resize, the
    # decode stand-in) still gets every core. Measured at sf3:
    # full-spread 2.32 s / narrow 2.05 s / none 4.49 s. Below the
    # rows floor even the narrow exchange's fixed stage cost exceeds
    # the whole workload (sf0.1: none 0.86 s vs narrow 1.78 s), so
    # the spread routes on the measured footer cardinality. Same
    # no-op-at-100TB posture: keyed on the measured split ceiling.
    docs = table(spark, sf_dir, "documents", heavy=False)
    gen_in = docs.select("doc_id")
    if table_rows(spark, sf_dir, "documents") >= SPREAD_MIN_ROWS:
        gen_in = spread(
            gen_in, "doc_id",
            measured=_measured_splits(spark, sf_dir, "documents"),
        )
    thumbs = resize_media(_raw_media(gen_in), _W2, _H2)
    return (
        thumbs.select(
            F.col("media_id").alias("doc_id"),
            _byte_sum("payload").alias("checksum"),
            F.col("meta.n_bytes").alias("nb"),
        )
        # equi-join back to the doc dim on the unique key; AQE picks a
        # broadcast at small sizes, a shuffle join at 100 TB (both
        # sides key-partitioned — no hint needed either way)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_imgs"),
            F.sum("nb").alias("n_bytes"),
            F.sum("checksum").alias("byte_sum"),
        )
        .orderBy("source")
    )
