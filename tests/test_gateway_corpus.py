"""§2.13 corpus through the SQL-TEXT gateway: Q1–Q17 (the pure-SELECT
subset) rendered as BigQuery-dialect text, executed via
`SqlGateway.sql`, and asserted EQUAL to the DataFrame-registry results
(plans/queries.py q01–q17) — the "paste your BigQuery SQL, get the
same answer" switching contract (reference sites
scripts/verify_loaded_data.sql:5-110, README.md:546-607,
PRD.md:923-972,3658-3691).

Q15 replays BigQuery's ANALYTIC spelling `PERCENTILE_CONT(value, 0.5)
OVER (PARTITION BY …)` — the PRD.md:853 form — which the gateway now
translates to Spark's `percentile(value, 0.5) OVER (…)` (closed in
round 9; the ANSI WITHIN GROUP spelling still passes through).

Out of scope here: Q18+ involve DML/streaming/time-travel surfaces
exercised by their own driver queries (q18-q25), not SELECT-text
replays.
"""

from __future__ import annotations

import pytest

from de_gcp_lakehouse_iceberg_spark.plans import QUERIES
from de_gcp_lakehouse_iceberg_spark.sql_gateway import SqlGateway
from de_gcp_lakehouse_iceberg_spark.tables import table

_T = "`${PROJECT_ID}.${DATASET_ID}.%s`"
_DSUM = "CAST(SUM(CAST(%s AS NUMERIC(18,2))) AS FLOAT64)"


def _gw(spark, sf_dir) -> SqlGateway:
    names = ["lineitem", "orders", "customer", "nation", "region", "events"]
    return SqlGateway(
        spark, {n: table(spark, sf_dir, n) for n in names}
    )


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


_CORPUS: dict[str, str] = {
    "q01_global_count": f"SELECT COUNT(*) AS cnt FROM {_T % 'lineitem'};",
    "q02_minmax_probe": f"""
        SELECT COUNT(*) AS cnt,
               MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
               MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        FROM {_T % 'orders'};""",
    "q03_top_groups": f"""
        SELECT l_suppkey, COUNT(*) AS item_count,
               floor({_DSUM % 'l_extendedprice'} / COUNT(*) * 100 + 0.5) / 100
                 AS avg_price
        FROM {_T % 'lineitem'}
        GROUP BY l_suppkey
        ORDER BY item_count DESC, l_suppkey LIMIT 10;""",
    "q04_nonnull_counts": f"""
        SELECT COUNT(event_id) AS cnt_event_id, COUNT(ts) AS cnt_ts,
               COUNT(user_id) AS cnt_user_id,
               COUNT(event_type) AS cnt_event_type, COUNT(value) AS cnt_value
        FROM {_T % 'events'};""",
    "q05_consistency_check": f"""
        WITH li AS (
          SELECT l_orderkey,
                 floor(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                     * (1 + l_tax) AS NUMERIC(18,6)))
                            AS FLOAT64) * 100 + 0.5) / 100 AS computed_total
          FROM {_T % 'lineitem'} GROUP BY l_orderkey)
        SELECT COUNT(*) AS mismatch_count
        FROM {_T % 'orders'} o JOIN li ON o.o_orderkey = li.l_orderkey
        WHERE ABS(o.o_totalprice - li.computed_total) > 0.01;""",
    "q06_rounded_freq": f"""
        SELECT CAST(FLOOR(value + 0.5) AS INT64) AS value_bucket,
               COUNT(*) AS cnt
        FROM {_T % 'events'}
        GROUP BY value_bucket
        ORDER BY cnt DESC, value_bucket LIMIT 15;""",
    "q07_star_join_revenue": f"""
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
               COUNT(*) AS item_count,
               floor(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS NUMERIC(18,6))) AS FLOAT64)
                     * 100 + 0.5) / 100 AS revenue,
               floor({_DSUM % 'l.l_quantity'} / COUNT(*) * 100 + 0.5) / 100
                 AS avg_quantity
        FROM {_T % 'lineitem'} l
        JOIN {_T % 'orders'} o   ON l.l_orderkey = o.o_orderkey
        JOIN {_T % 'customer'} c ON o.o_custkey = c.c_custkey
        JOIN {_T % 'nation'} n   ON c.c_nationkey = n.n_nationkey
        JOIN {_T % 'region'} r   ON n.n_regionkey = r.r_regionkey
        GROUP BY region_name, nation_name
        ORDER BY revenue DESC;""",
    "q08_hourly_pattern": f"""
        SELECT EXTRACT(HOUR FROM ts) AS hour_of_day,
               COUNT(*) AS event_count,
               floor({_DSUM % 'value'} / COUNT(*) * 100 + 0.5) / 100
                 AS avg_value,
               {_DSUM % 'value'} AS total_value
        FROM {_T % 'events'}
        GROUP BY hour_of_day ORDER BY hour_of_day;""",
    "q09_dashboard_having": f"""
        SELECT TIMESTAMP_TRUNC(ts, HOUR) AS stat_hour, event_type,
               COUNT(*) AS event_count,
               {_DSUM % 'value'} AS total_value,
               floor({_DSUM % 'value'} / COUNT(*) * 100 + 0.5) / 100
                 AS avg_value
        FROM {_T % 'events'}
        GROUP BY stat_hour, event_type
        HAVING COUNT(*) > 10
        ORDER BY stat_hour, event_type;""",
    "q10_daily_stats": f"""
        SELECT DATE(o_orderdate) AS order_date, o_orderpriority,
               COUNT(*) AS order_count,
               {_DSUM % 'o_totalprice'} AS total_revenue,
               floor({_DSUM % 'o_totalprice'} / COUNT(*) * 100 + 0.5) / 100
                 AS avg_revenue,
               COUNT(DISTINCT o_orderstatus) AS status_types,
               floor(COUNTIF(o_totalprice > 250000) / COUNT(*)
                     * 10000 + 0.5) / 10000 AS high_value_rate
        FROM {_T % 'orders'}
        GROUP BY order_date, o_orderpriority
        ORDER BY order_date, o_orderpriority;""",
    "q11_derived_duration": f"""
        SELECT l.l_returnflag, COUNT(*) AS item_count,
               floor(CAST(SUM(DATE_DIFF(DATE(l.l_shipdate),
                                        DATE(o.o_orderdate), DAY))
                          AS FLOAT64) / COUNT(*) * 100 + 0.5) / 100
                 AS avg_ship_delay_days,
               {_DSUM % 'l.l_extendedprice'} AS total_price
        FROM {_T % 'lineitem'} l
        JOIN {_T % 'orders'} o ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag;""",
    "q12_period_pct_change": f"""
        WITH before_p AS (
          SELECT o_orderpriority, COUNT(*) AS cnt_before,
                 {_DSUM % 'o_totalprice'} AS rev_before
          FROM {_T % 'orders'}
          WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY o_orderpriority),
        after_p AS (
          SELECT o_orderpriority, COUNT(*) AS cnt_after,
                 {_DSUM % 'o_totalprice'} AS rev_after
          FROM {_T % 'orders'}
          WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY o_orderpriority)
        SELECT b.o_orderpriority, b.cnt_before, a.cnt_after,
               b.rev_before, a.rev_after,
               floor((CAST(a.cnt_after AS FLOAT64) - b.cnt_before)
                     / b.cnt_before * 100 * 100 + 0.5) / 100
                 AS cnt_pct_change
        FROM before_p b JOIN after_p a
          ON b.o_orderpriority = a.o_orderpriority
        ORDER BY b.o_orderpriority;""",
    "q13_rank_selfjoin": f"""
        WITH monthly AS (
          SELECT l_suppkey,
                 TIMESTAMP_TRUNC(l_shipdate, MONTH) AS ship_month,
                 SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS NUMERIC(18,6))) AS mrev_dec
          FROM {_T % 'lineitem'} GROUP BY l_suppkey, ship_month),
        totals AS (
          SELECT l_suppkey, SUM(mrev_dec) AS total_dec,
                 CAST(RANK() OVER (ORDER BY SUM(mrev_dec) DESC, l_suppkey)
                      AS INT64) AS revenue_rank
          FROM monthly GROUP BY l_suppkey)
        SELECT t.l_suppkey,
               floor(CAST(t.total_dec AS FLOAT64) * 100 + 0.5) / 100
                 AS total_revenue,
               t.revenue_rank, m.ship_month,
               floor(CAST(m.mrev_dec AS FLOAT64) * 100 + 0.5) / 100
                 AS monthly_revenue
        FROM totals t JOIN monthly m ON t.l_suppkey = m.l_suppkey
        WHERE t.revenue_rank <= 25
        ORDER BY t.revenue_rank, m.ship_month;""",
    "q14_lag_rolling": f"""
        WITH hourly AS (
          SELECT event_type, TIMESTAMP_TRUNC(ts, HOUR) AS stat_hour,
                 COUNT(*) AS cnt,
                 {_DSUM % 'value'} AS total_value
          FROM {_T % 'events'} GROUP BY event_type, stat_hour)
        SELECT event_type, stat_hour, cnt, total_value,
               LAG(cnt, 1) OVER (PARTITION BY event_type
                                 ORDER BY stat_hour) AS cnt_lag_1,
               LAG(cnt, 24) OVER (PARTITION BY event_type
                                  ORDER BY stat_hour) AS cnt_lag_24,
               LAG(cnt, 168) OVER (PARTITION BY event_type
                                   ORDER BY stat_hour) AS cnt_lag_168,
               floor(AVG(cnt) OVER (PARTITION BY event_type
                                    ORDER BY stat_hour
                                    ROWS BETWEEN 23 PRECEDING
                                             AND CURRENT ROW)
                     * 10000 + 0.5) / 10000 AS rolling_avg_24h
        FROM hourly ORDER BY event_type, stat_hour;""",
    "q15_median_per_group": f"""
        SELECT DISTINCT event_type,
               floor(PERCENTILE_CONT(value, 0.5)
                       OVER (PARTITION BY event_type)
                     * 1000000 + 0.5) / 1000000 AS median_value,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM {_T % 'events'}
        ORDER BY event_type;""",
    "q16_union_federation": f"""
        WITH src_f AS (
          SELECT 'closed' AS segment, o_orderpriority,
                 COUNT(*) AS cnt,
                 SUM(CAST(o_totalprice AS NUMERIC(18,2))) AS rev
          FROM {_T % 'orders'} WHERE o_orderstatus = 'F'
          GROUP BY o_orderpriority),
        src_o AS (
          SELECT 'open' AS segment, o_orderpriority,
                 COUNT(*) AS cnt,
                 SUM(CAST(o_totalprice AS NUMERIC(18,2))) AS rev
          FROM {_T % 'orders'} WHERE o_orderstatus = 'O'
          GROUP BY o_orderpriority),
        unioned AS (SELECT * FROM src_f UNION ALL SELECT * FROM src_o)
        SELECT o_orderpriority,
               SUM(cnt) AS total_orders,
               CAST(SUM(rev) AS FLOAT64) AS total_revenue,
               floor(CAST(SUM(rev) AS FLOAT64) / SUM(cnt) * 100 + 0.5) / 100
                 AS revenue_per_order
        FROM unioned GROUP BY o_orderpriority ORDER BY o_orderpriority;""",
    "q17_semijoin_topk": f"""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM {_T % 'lineitem'}
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM {_T % 'orders'}
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
        ORDER BY l_orderkey, l_linenumber;""",
}


@pytest.mark.parametrize("name", sorted(_CORPUS))
def test_gateway_corpus_matches_registry(spark, sf_dir, name):
    gw = _gw(spark, sf_dir)
    _assert_same(gw.sql(_CORPUS[name]), QUERIES[name](spark, sf_dir))
