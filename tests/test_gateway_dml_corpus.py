"""§2.13 Q18-Q24 as FULL BigQuery-dialect TEXT through the gateway —
the DML / windowed / time-travel tail the SELECT-only corpus test
(test_gateway_corpus.py) left to registry queries. Each test replays
the PRD's statement sequence (MERGE PRD.md:769-779, DELETE
PRD.md:782-787, UPDATE PRD.md:790-797, time travel
verify_loaded_data.sql:108-110) via `SqlGateway.execute`/`sql` against
a fresh LakeTable and asserts the result EQUAL to the registry query
(q18-q24) the driver hash-gates — the "paste your BigQuery SQL"
switching contract for the mutation surface (VERDICT r9 #7)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.plans import QUERIES
from de_gcp_lakehouse_iceberg_spark.sql_gateway import SqlGateway
from de_gcp_lakehouse_iceberg_spark.tables import table

_T = "`${PROJECT_ID}.${DATASET_ID}.%s`"


def _assert_same(gw_df, reg_df):
    a = [tuple(r) for r in gw_df.collect()]
    b = [tuple(r) for r in reg_df.collect()]

    def key(t):
        return tuple(repr(x) for x in t)

    a.sort(key=key)
    b.sort(key=key)
    assert len(a) == len(b), (len(a), len(b))
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb)
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                assert x == y or abs(x - y) <= 1e-12 * max(abs(x), abs(y)), (
                    x,
                    y,
                )
            else:
                assert x == y, (x, y)


def _fresh(spark, tmp_path, name, df, partition_by=None) -> LakeTable:
    t = LakeTable.create(
        spark, str(tmp_path / name), partition_by=partition_by
    )
    t.append(df)
    return t


def test_q18_validation_split_text(spark, sf_dir):
    gw = SqlGateway(spark, {"events": table(spark, sf_dir, "events")})
    got = gw.sql(f"""
        SELECT CASE
                 WHEN value IS NULL OR ts IS NULL THEN 'missing_field'
                 WHEN value <= 0 THEN 'validation_failed'
                 WHEN user_id < 0 THEN 'invalid_id'
                 ELSE 'valid'
               END AS record_class,
               COUNT(*) AS cnt
        FROM {_T % 'events'}
        GROUP BY record_class
        ORDER BY record_class;""")
    _assert_same(got, QUERIES["q18_validation_split"](spark, sf_dir))


def test_q19_merge_text_sequence(spark, sf_dir, tmp_path):
    """The PRD.md:769-779 MERGE shape (matched recode + not-matched
    insert), as one statement of BigQuery text, lands the exact state
    the registry's q19 DataFrame path produces."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    t = _fresh(spark, tmp_path, "orders_t", orders)
    gw = SqlGateway(spark, {"orders_t": t, "orders_src": orders})
    gw.execute("""
        MERGE INTO orders_t AS t USING (
          SELECT o_orderkey, 'R' AS o_orderstatus,
                 o_totalprice, o_orderpriority
          FROM orders_src WHERE o_totalprice > 400000
          UNION ALL
          SELECT CAST(-(1 + ROW_NUMBER() OVER (ORDER BY o_orderpriority))
                      AS INT64) AS o_orderkey,
                 'N' AS o_orderstatus,
                 CAST(100.0 AS FLOAT64) AS o_totalprice,
                 o_orderpriority
          FROM (SELECT DISTINCT o_orderpriority FROM orders_src)
        ) AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_orderstatus = s.o_orderstatus
        WHEN NOT MATCHED THEN INSERT ROW""")
    got = gw.sql("""
        SELECT o_orderstatus, COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS NUMERIC(18,2))) AS FLOAT64)
                 AS total_revenue
        FROM orders_t GROUP BY o_orderstatus ORDER BY o_orderstatus;""")
    _assert_same(got, QUERIES["q19_merge_fix"](spark, sf_dir))


def test_q20_delete_update_text_sequence(spark, sf_dir, tmp_path):
    """DELETE purge (PRD.md:782-787) then UPDATE recode
    (PRD.md:790-797) as text; final grouped state equals registry q20."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    t = _fresh(spark, tmp_path, "li_t", li, partition_by=["l_returnflag"])
    gw = SqlGateway(spark, {"li_t": t})
    gw.execute("DELETE FROM li_t WHERE l_quantity >= 49")
    gw.execute("UPDATE li_t SET l_returnflag = 'X' WHERE l_returnflag = 'R'")
    got = gw.sql("""
        SELECT l_returnflag, COUNT(*) AS item_count,
               CAST(SUM(CAST(l_quantity AS NUMERIC(18,2))) AS FLOAT64)
                 AS total_quantity
        FROM li_t GROUP BY l_returnflag ORDER BY l_returnflag;""")
    _assert_same(got, QUERIES["q20_delete_update"](spark, sf_dir))


def test_q21_time_travel_text_sequence(spark, sf_dir, tmp_path):
    """INSERT INTO ... SELECT text lands the second batch; FOR
    SYSTEM_TIME AS OF text reads the pre-append state
    (verify_loaded_data.sql:108-110). Counts equal registry q21's."""
    import time as _time

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    split = F.lit("1997-01-01").cast("timestamp")
    t = _fresh(
        spark, tmp_path, "orders_tt", orders.filter(F.col("o_orderdate") < split)
    )
    gw = SqlGateway(spark, {"orders_tt": t, "orders_src": orders})
    _time.sleep(0.02)
    ts_between = _time.strftime("%Y-%m-%d %H:%M:%S", _time.gmtime())
    # sub-second manifests: pin the as-of to wall time AFTER v1's commit
    asof_ms = int(_time.time() * 1000)
    _time.sleep(0.02)
    gw.execute(
        "INSERT INTO orders_tt SELECT * FROM orders_src "
        "WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'"
    )
    del ts_between  # documented: second-resolution literal is too coarse
    import datetime as _dt

    asof = _dt.datetime.fromtimestamp(
        asof_ms / 1000, tz=_dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    v1_cnt = gw.sql(
        "SELECT COUNT(*) AS c FROM orders_tt "
        f"FOR SYSTEM_TIME AS OF '{asof}'"
    ).collect()[0]["c"]
    cur_cnt = gw.sql("SELECT COUNT(*) AS c FROM orders_tt").collect()[0]["c"]
    reg = QUERIES["q21_time_travel"](spark, sf_dir).collect()[0]
    assert (v1_cnt, cur_cnt) == (reg["count_v1"], reg["count_current"])
    assert len(t.snapshots()) == reg["snapshot_count"]


def test_q22_tumbling_window_text(spark, sf_dir):
    """The 60 s tumbling-window batch shape as pure text: epoch-aligned
    bucket arithmetic equals Spark's window() (registry q22)."""
    gw = SqlGateway(spark, {"events": table(spark, sf_dir, "events")})
    got = gw.sql(f"""
        SELECT TIMESTAMP_SECONDS(
                 CAST(FLOOR(UNIX_SECONDS(ts) / 60) * 60 AS INT64))
                 AS window_start,
               event_type, COUNT(*) AS event_count,
               CAST(SUM(CAST(value AS NUMERIC(18,2))) AS FLOAT64)
                 AS total_value
        FROM {_T % 'events'}
        GROUP BY window_start, event_type
        HAVING COUNT(*) >= 2
        ORDER BY window_start, event_type;""")
    _assert_same(got, QUERIES["q22_tumbling_window"](spark, sf_dir))


def test_q23_approx_median_text(spark, sf_dir):
    """APPROX_QUANTILES text → Spark percentile_approx; the tolerance
    flag vs exact PERCENTILE_CONT matches registry q23."""
    gw = SqlGateway(spark, {"events": table(spark, sf_dir, "events")})
    # the BigQuery spelling: APPROX_QUANTILES(value, 2)[OFFSET(1)]
    got = gw.sql(f"""
        SELECT event_type,
               FLOOR(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value)
                     * 1000000 + 0.5) / 1000000 AS exact_median,
               ABS(APPROX_QUANTILES(value, 2)[OFFSET(1)]
                   - PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value))
                 <= 0.05 * (ABS(PERCENTILE_CONT(0.5)
                                WITHIN GROUP (ORDER BY value)) + 1.0)
                 AS approx_within_5pct,
               COUNT(*) AS cnt
        FROM {_T % 'events'}
        GROUP BY event_type
        ORDER BY event_type;""")
    _assert_same(got, QUERIES["q23_approx_median"](spark, sf_dir))


def test_q24_quality_score_text(spark, sf_dir):
    gw = SqlGateway(spark, {"events": table(spark, sf_dir, "events")})
    got = gw.sql(f"""
        SELECT COUNT(*) AS total_records,
               FLOOR(CAST(COUNTIF(value > 0) AS FLOAT64)
                     / COUNT(*) * 10000 + 0.5) / 10000
                 AS positive_value_ratio,
               FLOOR(CAST(COUNTIF(props IS NOT NULL) AS FLOAT64)
                     / COUNT(*) * 10000 + 0.5) / 10000
                 AS props_present_ratio,
               FLOOR(CAST(COUNTIF(user_id IS NOT NULL) AS FLOAT64)
                     / COUNT(*) * 10000 + 0.5) / 10000
                 AS user_present_ratio
        FROM {_T % 'events'};""")
    _assert_same(got, QUERIES["q24_quality_score"](spark, sf_dir))
