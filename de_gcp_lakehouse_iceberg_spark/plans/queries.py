"""Query corpus — SURVEY.md §2.13 operator shapes re-expressed over the
driver's TPC-H-ish testdata (TESTDATA.md), each with a DuckDB oracle.

Every query is a declarative DataFrame/SQL plan: Catalyst handles
predicate pushdown, column pruning, and join strategy. Dimension tables
that stay small at any scale (region, nation) are broadcast-hinted;
fact-fact joins are left to AQE (sort-merge + runtime skew handling).

## Cross-engine numeric determinism

The driver hash-compares Spark results against DuckDB. Two float
pitfalls are handled structurally:

1. Rounding-mode divergence: Spark ``round()`` applies HALF_UP to the
   double's shortest decimal repr; DuckDB rounds the true binary value.
   They disagree whenever the repr lands on ``x..x5``. We therefore
   round with ``floor(x * 10^s + 0.5) / 10^s`` written identically in
   both dialects — identical IEEE ops on identical doubles give
   bit-identical results.
2. Summation-order noise: double sums depend on partition order. All
   money sums first cast per-row to DECIMAL (exact, order-independent,
   and tie-free: no double can sit exactly on a decimal rounding
   boundary because (2k+1)/(2*10^s) is never a binary rational), are
   summed exactly, and only then cast back to double.

Helper pair: ``_r(col, s)`` / SQL ``floor(x*10^s + 0.5)/10^s`` and
``_dsum(col, s)`` / SQL ``CAST(sum(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.

Reference parity notes cite /root/reference file:line in each docstring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _r(col: Column, s: int) -> Column:
    """Deterministic cross-engine rounding (see module docstring)."""
    m = 10**s
    return F.floor(col * m + F.lit(0.5)) / F.lit(m)


def _dsum(col, scale: int = 2, prec: int = 18) -> Column:
    """Exact (order-independent) sum of a double column via decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double")


def _davg(col, s: int = 2, scale: int = 2) -> Column:
    """Deterministic mean: exact decimal sum / count, floor-rounded."""
    return _r(_dsum(col, scale) / F.count("*"), s)


# --------------------------------------------------------------------------
# §2.4 A1 / §2.1 S4 — global count (verify_loaded_data.sql:5-6)
# --------------------------------------------------------------------------
@register(
    "q01_global_count",
    oracle="SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem",
)
def q01_global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


# --------------------------------------------------------------------------
# §2.4 A3 — min/max/count probe (verify_loaded_data.sql:20-26)
# --------------------------------------------------------------------------
@register(
    "q02_minmax_probe",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           min(o_orderdate) AS min_date,
           max(o_orderdate) AS max_date,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    """,
)
def q02_minmax_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").agg(
        F.count("*").alias("cnt"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# --------------------------------------------------------------------------
# §2.4 A2 + §2.6 O3 — group/multi-agg + deterministic top-k
# (verify_loaded_data.sql:36-43: top zones by trip count)
# --------------------------------------------------------------------------
@register(
    "q03_top_groups",
    oracle="""
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS item_count,
           floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) * 100 + 0.5) / 100 AS avg_price
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY item_count DESC, l_suppkey
    LIMIT 10
    """,
)
def q03_top_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("item_count"),
            _davg("l_extendedprice").alias("avg_price"),
        )
        .orderBy(F.desc("item_count"), F.asc("l_suppkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# §2.4 A3 + §2.2 P12 — per-column non-null counts (verify_loaded_data.sql:59-65)
# --------------------------------------------------------------------------
@register(
    "q04_nonnull_counts",
    oracle="""
    SELECT CAST(count(event_id) AS BIGINT) AS cnt_event_id,
           CAST(count(ts) AS BIGINT) AS cnt_ts,
           CAST(count(user_id) AS BIGINT) AS cnt_user_id,
           CAST(count(event_type) AS BIGINT) AS cnt_event_type,
           CAST(count(value) AS BIGINT) AS cnt_value
    FROM events
    """,
)
def q04_nonnull_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.count("event_id").alias("cnt_event_id"),
        F.count("ts").alias("cnt_ts"),
        F.count("user_id").alias("cnt_user_id"),
        F.count("event_type").alias("cnt_event_type"),
        F.count("value").alias("cnt_value"),
    )


# --------------------------------------------------------------------------
# Q5 shape — cross-field consistency check (verify_loaded_data.sql:67-79:
# abs(total - sum(components)) > 0.01). Here: order total vs lineitem sum.
# Exercises F13/F14/F20 + join + two-level agg.
# --------------------------------------------------------------------------
@register(
    "q05_consistency_check",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                            AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100
               AS computed_total
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS mismatch_count
    FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
    WHERE abs(o.o_totalprice - li.computed_total) > 0.01
    """,
)
def q05_consistency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    charge = (
        F.col("l_extendedprice")
        * (F.lit(1) - F.col("l_discount"))
        * (F.lit(1) + F.col("l_tax"))
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(_r(_dsum(charge, scale=6), 2).alias("computed_total"))
    )
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.abs(F.col("o_totalprice") - F.col("computed_total")) > 0.01)
        .agg(F.count("*").alias("mismatch_count"))
    )


# --------------------------------------------------------------------------
# Q6 shape — rounded-value frequency top-k (verify_loaded_data.sql:81-88).
# Integer-boundary rounding is tie-safe across engines (x.5 is binary-exact,
# both round away from zero).
# --------------------------------------------------------------------------
@register(
    "q06_rounded_freq",
    oracle="""
    SELECT CAST(floor(value + 0.5) AS BIGINT) AS value_bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY value_bucket
    ORDER BY cnt DESC, value_bucket
    LIMIT 15
    """,
)
def q06_rounded_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(
            F.floor(F.col("value") + 0.5).cast("long").alias("value_bucket")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("value_bucket"))
        .limit(15)
    )


# --------------------------------------------------------------------------
# Q7 shape (flagship) — fact⟶dim star join + agg (README.md:548-557 zone join;
# J1/J3/A2/O1). lineitem⋈orders⋈customer⋈nation⋈region, revenue per nation.
# nation/region stay tiny at any SF → broadcast; customer join left to AQE.
# --------------------------------------------------------------------------
@register(
    "q07_star_join_revenue",
    oracle="""
    SELECT r.r_name AS region_name,
           n.n_name AS nation_name,
           CAST(count(*) AS BIGINT) AS item_count,
           floor(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100
             AS revenue,
           floor(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) * 100 + 0.5) / 100 AS avg_quantity
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY region_name, nation_name
    ORDER BY revenue DESC
    """,
)
def q07_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count("*").alias("item_count"),
            _r(_dsum(disc_price, scale=6), 2).alias("revenue"),
            _davg("l_quantity").alias("avg_quantity"),
        )
        .orderBy(F.desc("revenue"))
    )


# --------------------------------------------------------------------------
# Q8 shape — hourly pattern: EXTRACT(HOUR) + agg (README.md:560-568; F1/A2/O1)
# --------------------------------------------------------------------------
@register(
    "q08_hourly_pattern",
    oracle="""
    SELECT CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS event_count,
           floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) * 100 + 0.5) / 100 AS avg_value,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY hour_of_day
    ORDER BY hour_of_day
    """,
)
def q08_hourly_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.hour("ts").alias("hour_of_day"))
        .agg(
            F.count("*").alias("event_count"),
            _davg("value").alias("avg_value"),
            _dsum("value").alias("total_value"),
        )
        .orderBy("hour_of_day")
    )


# --------------------------------------------------------------------------
# Q9 shape — dashboard: date_trunc(hour) × key, HAVING (README.md:594-606;
# F3/A2/A10/O1)
# --------------------------------------------------------------------------
@register(
    "q09_dashboard_having",
    oracle="""
    SELECT date_trunc('hour', ts) AS stat_hour,
           event_type,
           CAST(count(*) AS BIGINT) AS event_count,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) * 100 + 0.5) / 100 AS avg_value
    FROM events
    GROUP BY stat_hour, event_type
    HAVING count(*) > 10
    ORDER BY stat_hour, event_type
    """,
)
def q09_dashboard_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("stat_hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("event_count"),
            _dsum("value").alias("total_value"),
            _davg("value").alias("avg_value"),
        )
        .filter(F.col("event_count") > 10)
        .orderBy("stat_hour", "event_type")
    )


# --------------------------------------------------------------------------
# Q10 shape — daily stats view: date × key with COUNT DISTINCT + conditional
# rate (create_iceberg_tables.sql:170-184; F2/A2/A4/A5)
# --------------------------------------------------------------------------
@register(
    "q10_daily_stats",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
           floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) * 100 + 0.5) / 100 AS avg_revenue,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_types,
           floor(CAST(sum(CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS high_value_rate
    FROM orders
    GROUP BY order_date, o_orderpriority
    ORDER BY order_date, o_orderpriority
    """,
)
def q10_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            F.count("*").alias("order_count"),
            _dsum("o_totalprice").alias("total_revenue"),
            _davg("o_totalprice").alias("avg_revenue"),
            F.countDistinct("o_orderstatus").alias("status_types"),
            _r(
                F.sum(F.when(F.col("o_totalprice") > 250000, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*"),
                4,
            ).alias("high_value_rate"),
        )
        .orderBy("order_date", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q11 shape — derived-scalar agg: the Beam hourly-stats derivation
# (main.py:149-265: duration = (dropoff-pickup)/60 then avg). Here:
# ship delay in days between order date and ship date (P9/F13/A2 + join).
# --------------------------------------------------------------------------
@register(
    "q11_derived_duration",
    oracle="""
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS item_count,
           floor(CAST(sum(date_diff('day', CAST(o.o_orderdate AS DATE),
                                    CAST(l.l_shipdate AS DATE))) AS DOUBLE)
                 / count(*) * 100 + 0.5) / 100 AS avg_ship_delay_days,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q11_derived_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_delay_days",
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("item_count"),
            _r(F.sum("ship_delay_days").cast("double") / F.count("*"), 2).alias(
                "avg_ship_delay_days"
            ),
            _dsum("l_extendedprice").alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q12 shape — two-CTE period comparison + pct change (PRD.md:923-953;
# J2/A2/F13). Periods split at 1998-01-01 (data spans 1995..2001).
# --------------------------------------------------------------------------
@register(
    "q12_period_pct_change",
    oracle="""
    WITH before_p AS (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt_before,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_before
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY o_orderpriority
    ),
    after_p AS (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt_after,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_after
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      GROUP BY o_orderpriority
    )
    SELECT b.o_orderpriority,
           b.cnt_before, a.cnt_after, b.rev_before, a.rev_after,
           floor((CAST(a.cnt_after AS DOUBLE) - b.cnt_before) / b.cnt_before
                 * 100 * 100 + 0.5) / 100 AS cnt_pct_change
    FROM before_p b JOIN after_p a ON b.o_orderpriority = a.o_orderpriority
    ORDER BY b.o_orderpriority
    """,
)
def q12_period_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    split = F.lit("1998-01-01").cast("timestamp")
    before = (
        orders.filter(F.col("o_orderdate") < split)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("cnt_before"),
            _dsum("o_totalprice").alias("rev_before"),
        )
    )
    after = (
        orders.filter(F.col("o_orderdate") >= split)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("cnt_after"),
            _dsum("o_totalprice").alias("rev_after"),
        )
    )
    return (
        before.join(after, "o_orderpriority")
        .select(
            "o_orderpriority",
            "cnt_before",
            "cnt_after",
            "rev_before",
            "rev_after",
            _r(
                (F.col("cnt_after").cast("double") - F.col("cnt_before"))
                / F.col("cnt_before")
                * 100,
                2,
            ).alias("cnt_pct_change"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q13 shape — CTE + window RANK + self-join + rank-filter (PRD.md:3658-3691;
# W1/J6/A11/O4). Revenue kept in exact decimals until final projection so
# the RANK ordering is identical across engines.
# --------------------------------------------------------------------------
@register(
    "q13_rank_selfjoin",
    oracle="""
    WITH monthly AS (
      SELECT l_suppkey,
             CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
               AS mrev_dec
      FROM lineitem GROUP BY l_suppkey, ship_month
    ),
    totals AS (
      SELECT l_suppkey,
             sum(mrev_dec) AS total_dec,
             CAST(rank() OVER (ORDER BY sum(mrev_dec) DESC, l_suppkey) AS BIGINT)
               AS revenue_rank
      FROM monthly GROUP BY l_suppkey
    )
    SELECT t.l_suppkey,
           floor(CAST(t.total_dec AS DOUBLE) * 100 + 0.5) / 100 AS total_revenue,
           t.revenue_rank,
           m.ship_month,
           floor(CAST(m.mrev_dec AS DOUBLE) * 100 + 0.5) / 100 AS monthly_revenue
    FROM totals t JOIN monthly m ON t.l_suppkey = m.l_suppkey
    WHERE t.revenue_rank <= 25
    ORDER BY t.revenue_rank, m.ship_month
    """,
)
def q13_rank_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    monthly = li.groupBy(
        "l_suppkey", F.date_trunc("month", "l_shipdate").alias("ship_month")
    ).agg(F.sum(disc_price.cast("decimal(18,6)")).alias("mrev_dec"))
    totals = (
        monthly.groupBy("l_suppkey")
        .agg(F.sum("mrev_dec").alias("total_dec"))
        .select(
            "l_suppkey",
            "total_dec",
            F.rank()
            .over(W.orderBy(F.desc("total_dec"), F.asc("l_suppkey")))
            .cast("long")
            .alias("revenue_rank"),
        )
    )
    return (
        totals.filter(F.col("revenue_rank") <= 25)
        .join(monthly, "l_suppkey")
        .select(
            "l_suppkey",
            _r(F.col("total_dec").cast("double"), 2).alias("total_revenue"),
            "revenue_rank",
            "ship_month",
            _r(F.col("mrev_dec").cast("double"), 2).alias("monthly_revenue"),
        )
        .orderBy("revenue_rank", "ship_month")
    )


# --------------------------------------------------------------------------
# Q14 shape — LAG features + rolling-frame AVG (PRD.md:5255-5272; W3/W4)
# --------------------------------------------------------------------------
@register(
    "q14_lag_rolling",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS stat_hour,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY event_type, stat_hour
    )
    SELECT event_type, stat_hour, cnt, total_value,
           lag(cnt, 1)   OVER w AS cnt_lag_1,
           lag(cnt, 24)  OVER w AS cnt_lag_24,
           lag(cnt, 168) OVER w AS cnt_lag_168,
           floor(avg(cnt) OVER (PARTITION BY event_type ORDER BY stat_hour
                                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
                 * 10000 + 0.5) / 10000 AS rolling_avg_24h
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY stat_hour)
    ORDER BY event_type, stat_hour
    """,
)
def q14_lag_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("stat_hour"))
        .agg(
            F.count("*").alias("cnt"),
            _dsum("value").alias("total_value"),
        )
    )
    w = W.partitionBy("event_type").orderBy("stat_hour")
    return (
        hourly.select(
            "event_type",
            "stat_hour",
            "cnt",
            "total_value",
            F.lag("cnt", 1).over(w).alias("cnt_lag_1"),
            F.lag("cnt", 24).over(w).alias("cnt_lag_24"),
            # 168 h = the week-over-week feature (PRD.md:5262)
            F.lag("cnt", 168).over(w).alias("cnt_lag_168"),
            _r(F.avg("cnt").over(w.rowsBetween(-23, 0)), 4).alias("rolling_avg_24h"),
        )
        .orderBy("event_type", "stat_hour")
    )


# --------------------------------------------------------------------------
# Q15 shape — exact median per group via PERCENTILE_CONT (PRD.md:853; A9/W5).
# Median of 2dp data has ≤3 decimals → the 6dp floor-round has huge margin
# even if the two engines interpolate with different op orderings.
# --------------------------------------------------------------------------
@register(
    "q15_median_per_group",
    oracle="""
    SELECT event_type,
           floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY value)
                 * 1000000 + 0.5) / 1000000 AS median_value,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q15_median_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_q15_events")
    return spark.sql(
        """
        SELECT event_type,
               floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY value)
                     * 1000000 + 0.5) / 1000000 AS median_value,
               count(*) AS cnt
        FROM _q15_events
        GROUP BY event_type
        ORDER BY event_type
        """
    )


# --------------------------------------------------------------------------
# Q16 shape — UNION ALL federation + re-aggregation (PRD.md:1317-1356;
# U1/A11/A13). Branch revenues stay decimal through the union so the
# re-aggregation is exact.
# --------------------------------------------------------------------------
@register(
    "q16_union_federation",
    oracle="""
    WITH src_f AS (
      SELECT 'closed' AS segment, o_orderpriority,
             CAST(count(*) AS BIGINT) AS cnt,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
    ),
    src_o AS (
      SELECT 'open' AS segment, o_orderpriority,
             CAST(count(*) AS BIGINT) AS cnt,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders WHERE o_orderstatus = 'O' GROUP BY o_orderpriority
    ),
    unioned AS (
      SELECT * FROM src_f UNION ALL SELECT * FROM src_o
    )
    SELECT o_orderpriority,
           CAST(sum(cnt) AS BIGINT) AS total_orders,
           CAST(sum(rev) AS DOUBLE) AS total_revenue,
           floor(CAST(sum(rev) AS DOUBLE) / sum(cnt) * 100 + 0.5) / 100
             AS revenue_per_order
    FROM unioned
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q16_union_federation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")

    def branch(status: str, seg: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("cnt"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            )
            .select(F.lit(seg).alias("segment"), "o_orderpriority", "cnt", "rev")
        )

    unioned = branch("F", "closed").unionByName(branch("O", "open"))
    return (
        unioned.groupBy("o_orderpriority")
        .agg(
            F.sum("cnt").alias("total_orders"),
            F.sum("rev").cast("double").alias("total_revenue"),
            _r(
                F.sum("rev").cast("double") / F.sum("cnt"),
                2,
            ).alias("revenue_per_order"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q17 shape — semi-join against top-k subquery (PRD.md:956-972; J7/O3)
# --------------------------------------------------------------------------
@register(
    "q17_semijoin_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    )
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q17_semijoin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    top10 = (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(top10), "l_orderkey", "left_semi")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# Q18 shape — validation split counts (main.py:52-131; P2/P5/P8).
# Classifies rows into valid/invalid classes exactly like the reference's
# tagged-output parse (valid vs per-reason dead letters).
# --------------------------------------------------------------------------
@register(
    "q18_validation_split",
    oracle="""
    SELECT CASE
             WHEN value IS NULL OR ts IS NULL THEN 'missing_field'
             WHEN value <= 0 THEN 'validation_failed'
             WHEN user_id < 0 THEN 'invalid_id'
             ELSE 'valid'
           END AS record_class,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY record_class
    ORDER BY record_class
    """,
)
def q18_validation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    record_class = (
        F.when(F.col("value").isNull() | F.col("ts").isNull(), "missing_field")
        .when(F.col("value") <= 0, "validation_failed")
        .when(F.col("user_id") < 0, "invalid_id")
        .otherwise("valid")
    )
    return (
        ev.groupBy(record_class.alias("record_class"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("record_class")
    )


# --------------------------------------------------------------------------
# Q22 shape — fixed 60 s tumbling window agg, batch replay of the streaming
# pipeline (main.py:373-390; T1/T2). Oracle uses epoch-aligned buckets,
# identical to Spark's epoch-aligned window().
# --------------------------------------------------------------------------
@register(
    "q22_tumbling_window",
    oracle="""
    -- make_timestamp(micros) builds TIMESTAMP (NTZ) straight from the
    -- epoch — TZ-independent, unlike to_timestamp()::TIMESTAMP whose
    -- rendering follows DuckDB's TimeZone setting
    SELECT make_timestamp(CAST(floor(epoch(ts) / 60) * 60 AS BIGINT) * 1000000)
             AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS event_count,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start, event_type
    HAVING count(*) >= 2
    ORDER BY window_start, event_type
    """,
)
def q22_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "60 seconds").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("event_count"),
            _dsum("value").alias("total_value"),
        )
        .filter(F.col("event_count") >= 2)
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# Q23 shape — approx median (APPROX_QUANTILES, PRD.md:4574-4586; A8).
# Approx sketches differ between engines (Spark: variant of KLL;
# DuckDB: t-digest), so the raw approx value can't be hash-compared.
# Oracle strategy: each engine runs ITS approx aggregate and reduces it
# to a tolerance flag against the exact PERCENTILE_CONT — the hashed
# columns are the exact median + the flag, so the driver still verifies
# the approx path end-to-end (a broken sketch flips the flag) without
# demanding bit-equal sketches.
# --------------------------------------------------------------------------
@register(
    "q23_approx_median",
    oracle="""
    SELECT event_type,
           floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY value)
                 * 1000000 + 0.5) / 1000000 AS exact_median,
           abs(approx_quantile(value, 0.5)
               - percentile_cont(0.5) WITHIN GROUP (ORDER BY value))
             <= 0.05 * (abs(percentile_cont(0.5) WITHIN GROUP (ORDER BY value)) + 1.0)
             AS approx_within_5pct,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q23_approx_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_q23_events")
    return spark.sql(
        """
        SELECT event_type,
               floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY value)
                     * 1000000 + 0.5) / 1000000 AS exact_median,
               abs(percentile_approx(value, 0.5)
                   - percentile_cont(0.5) WITHIN GROUP (ORDER BY value))
                 <= 0.05 * (abs(percentile_cont(0.5) WITHIN GROUP (ORDER BY value)) + 1.0)
                 AS approx_within_5pct,
               count(*) AS cnt
        FROM _q23_events
        GROUP BY event_type
        ORDER BY event_type
        """
    )


# --------------------------------------------------------------------------
# Q24 shape — data-quality score: conditional sums → ratios
# (PRD.md:2759-2775; A5/A13)
# --------------------------------------------------------------------------
@register(
    "q24_quality_score",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS total_records,
           floor(CAST(sum(CASE WHEN value > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS positive_value_ratio,
           floor(CAST(sum(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS props_present_ratio,
           floor(CAST(sum(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS user_present_ratio
    FROM events
    """,
)
def q24_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def ratio(cond, name):
        return _r(
            F.sum(F.when(cond, 1).otherwise(0)).cast("double") / F.count("*"), 4
        ).alias(name)

    return ev.agg(
        F.count("*").alias("total_records"),
        ratio(F.col("value") > 0, "positive_value_ratio"),
        ratio(F.col("props").isNotNull(), "props_present_ratio"),
        ratio(F.col("user_id").isNotNull(), "user_present_ratio"),
    )
