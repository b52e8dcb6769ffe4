"""SQL-text gateway (sql_gateway.py): the reference's BigQuery-dialect
SQL runs verbatim — verify_loaded_data.sql statements over a real taxi
warehouse, README analytics shapes, and FOR SYSTEM_TIME time travel /
change history against the lakehouse layer."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, dml
from de_gcp_lakehouse_iceberg_spark.sources import generator, ingest
from de_gcp_lakehouse_iceberg_spark.sources.warehouse_setup import (
    create_taxi_warehouse,
)
from de_gcp_lakehouse_iceberg_spark.sql_gateway import SqlGateway, translate


def test_translate_rules():
    assert translate("SELECT * FROM `p.d.taxi_trips`;") == (
        "SELECT * FROM taxi_trips"
    )
    assert translate(
        "SELECT DATE_TRUNC(pickup_datetime, HOUR) FROM `a.b.t`"
    ) == "SELECT date_trunc('HOUR', pickup_datetime) FROM t"
    assert translate(
        "WHERE ts >= TIMESTAMP_SUB(CURRENT_TIMESTAMP(), INTERVAL 24 HOUR)"
    ) == "WHERE ts >= (CURRENT_TIMESTAMP() - INTERVAL 24 HOUR)"
    assert translate(
        "SELECT DATE_SUB(CURRENT_DATE(), INTERVAL 7 DAY)"
    ) == "SELECT (CURRENT_DATE() - INTERVAL 7 DAY)"
    assert translate("SELECT TIMESTAMP_DIFF(b, a, MINUTE)") == (
        "SELECT timestampdiff(MINUTE, a, b)"
    )
    assert translate("SELECT COUNTIF(x > 1), SAFE_DIVIDE(a, b)") == (
        "SELECT count_if(x > 1), try_divide(a, b)"
    )
    assert translate("SELECT FORMAT_DATE('%A', d)") == (
        "SELECT date_format(d, 'EEEE')"
    )


def _trips_warehouse(spark, tmp_path, n=120):
    wh = create_taxi_warehouse(spark, str(tmp_path / "wh"))
    trips = generator.generate_trips(n, seed=7)
    generator.write_jsonl(trips, str(tmp_path / "in"), files=2)
    valid = ingest.valid_trips(
        ingest.classify_trips(
            ingest.read_jsonl(spark, str(tmp_path / "in") + "/*.jsonl")
        )
    )
    wh.table("taxi_trips").append(
        valid.withColumn(
            "pickup_date", F.to_date("pickup_datetime").cast("string")
        )
    )
    return wh, valid


def test_reference_verify_sql_statements(spark, tmp_path):
    """verify_loaded_data.sql shapes over the gateway — counts, MIN/MAX
    freshness, top-locations, null-audit, total-consistency."""
    wh, enriched = _trips_warehouse(spark, tmp_path)
    gw = SqlGateway(spark, {"taxi_trips": wh.table("taxi_trips")})
    n = enriched.count()

    r = gw.sql(
        "SELECT COUNT(*) as total_records "
        "FROM `${PROJECT_ID}.${DATASET_ID}.taxi_trips`;"
    ).first()
    assert r["total_records"] == n

    r = gw.sql(
        """SELECT COUNT(*) as records_loaded,
                  MIN(created_at) as first_loaded,
                  MAX(created_at) as last_loaded
           FROM `${PROJECT_ID}.${DATASET_ID}.taxi_trips`"""
    ).first()
    assert r["records_loaded"] == n and r["first_loaded"] <= r["last_loaded"]

    top = gw.sql(
        """SELECT pickup_location_id, COUNT(*) as trip_count,
                  AVG(fare_amount) as avg_fare
           FROM `${PROJECT_ID}.${DATASET_ID}.taxi_trips`
           GROUP BY pickup_location_id
           ORDER BY trip_count DESC LIMIT 10;"""
    ).collect()
    assert 0 < len(top) <= 10 and all(r["avg_fare"] > 0 for r in top)

    audit = gw.sql(
        """SELECT COUNT(*) as total_records,
                  COUNT(pickup_datetime) as valid_pickup_times,
                  COUNT(fare_amount) as valid_fares
           FROM `${PROJECT_ID}.${DATASET_ID}.taxi_trips`"""
    ).first()
    assert audit["total_records"] == n == audit["valid_pickup_times"]

    bad = gw.sql(
        """SELECT trip_id,
                  ABS(total_amount - (fare_amount + extra + mta_tax
                      + tip_amount + tolls_amount)) as difference
           FROM `${PROJECT_ID}.${DATASET_ID}.taxi_trips`
           WHERE ABS(total_amount - (fare_amount + extra + mta_tax
                     + tip_amount + tolls_amount)) > 0.01
           LIMIT 10"""
    ).collect()
    assert bad == []  # ingest enforces the money identity


def test_readme_hourly_pattern_sql(spark, tmp_path):
    wh, enriched = _trips_warehouse(spark, tmp_path)
    gw = SqlGateway(spark, {"taxi_trips": wh.table("taxi_trips")})
    rows = gw.sql(
        """SELECT EXTRACT(HOUR FROM pickup_datetime) as hour,
                  COUNT(*) as trips,
                  MIN(trip_distance) as min_distance
           FROM `project.taxi_dataset.taxi_trips`
           GROUP BY hour ORDER BY hour"""
    ).collect()
    assert sum(r["trips"] for r in rows) == enriched.count()
    assert all(0 <= r["hour"] <= 23 for r in rows)


def test_for_system_time_as_of_and_between(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(
        spark.range(10).select(
            F.col("id").alias("trip_id"), (F.col("id") * 2.0).alias("total_amount")
        )
    )
    v1_ts = t.snapshot().timestamp_ms
    import time as _time

    _time.sleep(0.05)
    dml.delete(t, "trip_id >= 5")
    gw = SqlGateway(spark, {"taxi_trips": t})

    asof = dt.datetime.fromtimestamp(
        v1_ts / 1000, dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    n_then = gw.sql(
        f"SELECT COUNT(*) as c FROM `p.d.taxi_trips` "
        f"FOR SYSTEM_TIME AS OF '{asof}'"
    ).first()["c"]
    assert n_then == 10
    assert gw.sql(
        "SELECT COUNT(*) as c FROM `p.d.taxi_trips`"
    ).first()["c"] == 5

    hi = dt.datetime.now(dt.timezone.utc) + dt.timedelta(seconds=5)
    changes = gw.sql(
        f"""SELECT trip_id, _CHANGE_TYPE
            FROM `p.d.taxi_trips`
            FOR SYSTEM_TIME BETWEEN '{asof}' AND
            '{hi.strftime("%Y-%m-%d %H:%M:%S")}'
            ORDER BY trip_id"""
    ).collect()
    assert [r["trip_id"] for r in changes] == [5, 6, 7, 8, 9]
    assert {r["_CHANGE_TYPE"] for r in changes} == {"DELETE"}


def test_system_time_binds_to_its_own_table(spark, tmp_path):
    """A FOR SYSTEM_TIME clause applies ONLY to the table it follows:
    joining a time-traveled LakeTable to (a) a plain DataFrame and
    (b) another LakeTable at head must not leak the clause across."""
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(
        spark.range(10).select(
            F.col("id").alias("trip_id"), (F.col("id") * 2.0).alias("amt")
        )
    )
    v1_ts = t.snapshot().timestamp_ms
    import time as _time

    _time.sleep(0.05)
    dml.delete(t, "trip_id >= 5")

    zones = spark.range(10).select(
        F.col("id").alias("trip_id"), F.lit("z").alias("zone")
    )
    asof = dt.datetime.fromtimestamp(
        v1_ts / 1000, dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")

    # (a) LakeTable time-traveled, plain DataFrame beside it — the
    # clause must not be claimed by `zones` (which would raise)
    gw = SqlGateway(spark, {"zones": zones, "trips": t})
    n = gw.sql(
        f"""SELECT COUNT(*) AS c
            FROM trips FOR SYSTEM_TIME AS OF '{asof}'
            JOIN zones ON trips.trip_id = zones.trip_id"""
    ).first()["c"]
    assert n == 10  # pre-delete snapshot of trips, all 10 join

    # (b) two LakeTables, only ONE carries the clause: the other must
    # read at head, not at the first table's timestamp
    u = LakeTable.create(spark, str(tmp_path / "u"))
    u.append(
        spark.range(3).select(
            F.col("id").alias("trip_id"), F.lit(1).alias("k")
        )
    )
    gw2 = SqlGateway(spark, {"trips": t, "others": u})
    r = gw2.sql(
        f"""SELECT (SELECT COUNT(*) FROM trips
                     FOR SYSTEM_TIME AS OF '{asof}') AS then_n,
                   (SELECT COUNT(*) FROM others) AS now_n"""
    ).first()
    assert r["then_n"] == 10 and r["now_n"] == 3

    # same table twice at different times is ambiguous → explicit error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="more than one FOR SYSTEM_TIME"):
        gw2.sql(
            f"""SELECT * FROM trips FOR SYSTEM_TIME AS OF '{asof}' a
                JOIN trips FOR SYSTEM_TIME AS OF '{asof}' b
                ON a.trip_id = b.trip_id"""
        )


def test_qualify_translation_text():
    out = translate(
        "SELECT a, b FROM t QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY a ORDER BY b) = 1 ORDER BY a LIMIT 3"
    )
    assert out == (
        "SELECT * EXCEPT (__qualify__) FROM (SELECT a, b, "
        "(ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) = 1) AS "
        "__qualify__ FROM t) WHERE __qualify__ ORDER BY a LIMIT 3"
    )
    # no QUALIFY -> untouched; the word inside a string literal too
    assert translate("SELECT 'QUALIFY' AS x FROM t") == (
        "SELECT 'QUALIFY' AS x FROM t"
    )


def test_qualify_executes_like_window_subquery(spark, tmp_path):
    wh, valid = _trips_warehouse(spark, tmp_path)
    gw = SqlGateway(spark, {"taxi_trips": wh.table("taxi_trips")})
    got = gw.sql(
        """SELECT vendor_id, trip_id, total_amount
           FROM `p.d.taxi_trips`
           QUALIFY ROW_NUMBER() OVER (PARTITION BY vendor_id
                    ORDER BY total_amount DESC, trip_id) = 1
           ORDER BY vendor_id"""
    ).collect()
    want = gw.sql(
        """SELECT vendor_id, trip_id, total_amount FROM (
             SELECT vendor_id, trip_id, total_amount,
                    ROW_NUMBER() OVER (PARTITION BY vendor_id
                      ORDER BY total_amount DESC, trip_id) AS rn
             FROM `p.d.taxi_trips`) WHERE rn = 1
           ORDER BY vendor_id"""
    ).collect()
    assert got == want
    assert [f.name for f in gw.sql(
        "SELECT vendor_id, trip_id FROM taxi_trips QUALIFY "
        "ROW_NUMBER() OVER (ORDER BY trip_id) <= 2"
    ).schema] == ["vendor_id", "trip_id"]  # helper column dropped


def test_qualify_with_cte(spark, tmp_path):
    wh, _ = _trips_warehouse(spark, tmp_path)
    gw = SqlGateway(spark, {"taxi_trips": wh.table("taxi_trips")})
    got = gw.sql(
        """WITH per_zone AS (
             SELECT pickup_location_id AS zone, COUNT(*) AS trips
             FROM taxi_trips GROUP BY pickup_location_id)
           SELECT zone, trips FROM per_zone
           QUALIFY RANK() OVER (ORDER BY trips DESC, zone) <= 3
           ORDER BY trips DESC, zone"""
    ).collect()
    assert len(got) >= 1
    trips_desc = [r["trips"] for r in got]
    assert trips_desc == sorted(trips_desc, reverse=True)
    assert len(got) <= 3


def _dml_table(spark, tmp_path, name="t"):
    t = LakeTable.create(spark, str(tmp_path / name))
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id int, tag string, amount double",
        )
    )
    return t


def test_execute_delete_and_update_text(spark, tmp_path):
    t = _dml_table(spark, tmp_path, "t1")
    gw = SqlGateway(spark, {"trips": t})
    gw.execute("DELETE FROM `p.d.trips` WHERE id = 2")
    assert sorted(r["id"] for r in t.scan().collect()) == [1, 3]
    gw.execute(
        "UPDATE trips SET amount = amount * 2, tag = 'x' WHERE id = 3"
    )
    rows = {r["id"]: (r["tag"], r["amount"]) for r in t.scan().collect()}
    assert rows[3] == ("x", 60.0) and rows[1] == ("a", 10.0)


def test_execute_insert_values_and_select(spark, tmp_path):
    t = _dml_table(spark, tmp_path, "t2")
    gw = SqlGateway(spark, {"trips": t})
    gw.execute(
        "INSERT INTO trips (id, tag, amount) VALUES (9, 'z', 90.0)"
    )
    assert {r["id"] for r in t.scan().collect()} == {1, 2, 3, 9}
    gw.execute(
        "INSERT INTO trips (id, tag, amount) "
        "SELECT id + 100, tag, amount FROM trips WHERE id = 1"
    )
    assert 101 in {r["id"] for r in t.scan().collect()}


def test_execute_merge_text(spark, tmp_path):
    t = _dml_table(spark, tmp_path, "t3")
    gw = SqlGateway(spark, {"trips": t})
    src = spark.createDataFrame(
        [(2, "B", 200.0), (7, "g", 70.0)],
        "id int, tag string, amount double",
    )
    src.createOrReplaceTempView("updates_src")
    gw.execute(
        """MERGE INTO trips AS tt
           USING (SELECT * FROM updates_src) AS s
           ON tt.id = s.id
           WHEN MATCHED THEN UPDATE SET tag = s.tag,
                                        amount = s.amount + tt.amount
           WHEN NOT MATCHED THEN INSERT ROW"""
    )
    rows = {r["id"]: (r["tag"], r["amount"]) for r in t.scan().collect()}
    assert rows[2] == ("B", 220.0)   # matched: updated
    assert rows[7] == ("g", 70.0)    # unmatched: inserted
    assert rows[1] == ("a", 10.0)    # untouched

    # update-only MERGE (no insert clause): unmatched rows dropped
    src2 = spark.createDataFrame(
        [(1, "A", 1.0), (55, "q", 5.0)], "id int, tag string, amount double"
    )
    gw2 = SqlGateway(spark, {"trips": t, "s2": src2})
    gw2.execute(
        """MERGE INTO trips USING s2 ON trips.id = s2.id
           WHEN MATCHED THEN UPDATE SET tag = s2.tag"""
    )
    rows = {r["id"]: r["tag"] for r in t.scan().collect()}
    assert rows[1] == "A" and 55 not in rows


def test_execute_falls_through_to_select(spark, tmp_path):
    t = _dml_table(spark, tmp_path, "t4")
    gw = SqlGateway(spark, {"trips": t})
    out = gw.execute("SELECT COUNT(*) AS n FROM trips")
    assert out.first()["n"] == 3


def test_execute_ddl_snapshot_ctas_truncate(spark, tmp_path):
    t = _dml_table(spark, tmp_path, "t5")
    gw = SqlGateway(spark, {"trips": t}, warehouse_root=str(tmp_path / "wh5"))

    # CTAS (+ self-registration for follow-up statements)
    gw.execute(
        "CREATE TABLE big AS SELECT id, amount FROM trips WHERE amount > 15"
    )
    assert sorted(r["id"] for r in gw.sql("SELECT id FROM big").collect()) == [2, 3]

    # snapshot clone is frozen at clone time
    gw.execute("CREATE SNAPSHOT TABLE trips_snap CLONE trips")
    gw.execute("DELETE FROM trips WHERE id = 1")
    assert gw.sql("SELECT COUNT(*) AS n FROM trips").first()["n"] == 2
    assert gw.sql("SELECT COUNT(*) AS n FROM trips_snap").first()["n"] == 3

    # OR REPLACE overwrites in place (new snapshot, same table)
    gw.execute(
        "CREATE OR REPLACE TABLE big AS SELECT id FROM trips WHERE id = 3"
    )
    assert [r["id"] for r in gw.sql("SELECT id FROM big").collect()] == [3]

    # TRUNCATE empties but keeps history (it is a delete commit)
    gw.execute("TRUNCATE TABLE big")
    assert gw.sql("SELECT COUNT(*) AS n FROM big").first()["n"] == 0

    # CREATE without OR REPLACE on an existing name is an error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="OR REPLACE"):
        gw.execute("CREATE TABLE big AS SELECT 1 AS x")


def test_metadata_tables_sql(spark, tmp_path):
    t = _dml_table(spark, tmp_path, "t6")
    gw = SqlGateway(spark, {"trips": t})
    gw.execute("DELETE FROM trips WHERE id = 1")
    snaps = gw.sql(
        "SELECT COUNT(*) AS n FROM trips.snapshots"
    ).first()["n"]
    assert snaps == 3  # create + append + delete
    hist = gw.sql(
        "SELECT operation FROM trips.history ORDER BY version"
    ).collect()
    assert [r["operation"] for r in hist] == ["create", "append", "delete"]
    files = gw.sql(
        "SELECT COUNT(*) AS n FROM trips.files"
    ).first()["n"]
    assert files >= 1
    # metadata join with the table itself in one statement
    both = gw.sql(
        """SELECT (SELECT COUNT(*) FROM trips) AS rows,
                  (SELECT MAX(version) FROM trips.snapshots) AS v"""
    ).first()
    assert both["rows"] == 2 and both["v"] == 2


def test_execute_export_data(spark, tmp_path):
    t = _dml_table(spark, tmp_path, "t7")
    gw = SqlGateway(spark, {"trips": t})
    out = str(tmp_path / "out_parquet")
    gw.execute(
        f"""EXPORT DATA OPTIONS(uri='{out}', format='PARQUET') AS
            SELECT id, amount FROM trips WHERE amount >= 20"""
    )
    back = spark.read.parquet(out)
    assert sorted(r["id"] for r in back.collect()) == [2, 3]
    out_csv = str(tmp_path / "out_csv")
    gw.execute(
        f"EXPORT DATA OPTIONS(uri='{out_csv}', format='CSV') AS "
        "SELECT id FROM trips"
    )
    n = spark.read.option("header", True).csv(out_csv).count()
    assert n == 3


# ---------------------------------------------------------------------------
# round-9 hardening: alias-collision MERGE, EXPORT overwrite semantics,
# QUALIFY statement scoping, analytic PERCENTILE_CONT translation
# ---------------------------------------------------------------------------
def test_merge_alias_collision_with_canonical_names(spark, tmp_path):
    """Target aliased `s`, source aliased `t` — the exact case a
    sequential alias substitution corrupts (target refs rewritten into
    source refs). The single-pass rewrite must keep them straight."""
    t = _dml_table(spark, tmp_path, "t8")
    src = spark.createDataFrame(
        [(2, "B", 200.0), (7, "g", 70.0)],
        "id int, tag string, amount double",
    )
    gw = SqlGateway(spark, {"trips": t, "upd": src})
    gw.execute(
        """MERGE INTO trips AS s USING upd AS t
           ON s.id = t.id
           WHEN MATCHED THEN UPDATE SET tag = t.tag,
                                        amount = t.amount + s.amount
           WHEN NOT MATCHED THEN INSERT ROW"""
    )
    rows = {r["id"]: (r["tag"], r["amount"]) for r in t.scan().collect()}
    assert rows[2] == ("B", 220.0)  # t.amount + s.amount = 200 + 20
    assert rows[7] == ("g", 70.0)
    assert rows[1] == ("a", 10.0)

    # `source` as the TARGET alias must also survive
    t2 = _dml_table(spark, tmp_path, "t8b")
    gw2 = SqlGateway(spark, {"trips": t2, "upd": src})
    gw2.execute(
        """MERGE INTO trips AS source USING upd AS u
           ON source.id = u.id
           WHEN MATCHED THEN UPDATE SET amount = source.amount + u.amount"""
    )
    rows = {r["id"]: r["amount"] for r in t2.scan().collect()}
    assert rows[2] == 220.0


def test_merge_identical_aliases_rejected(spark, tmp_path):
    t = _dml_table(spark, tmp_path, "t9")
    src = spark.createDataFrame([(2, "B", 1.0)], "id int, tag string, amount double")
    gw = SqlGateway(spark, {"trips": t, "upd": src})
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distinct"):
        gw.execute(
            """MERGE INTO trips AS x USING upd AS x
               ON x.id = x.id
               WHEN MATCHED THEN UPDATE SET tag = x.tag"""
        )


def test_export_data_overwrite_flag(spark, tmp_path):
    """BigQuery default: overwrite=false. Absent/false must refuse to
    clobber an existing destination; overwrite=true replaces it."""
    import pytest as _pytest

    t = _dml_table(spark, tmp_path, "t10")
    gw = SqlGateway(spark, {"trips": t})
    out = str(tmp_path / "exp")
    gw.execute(
        f"EXPORT DATA OPTIONS(uri='{out}', format='PARQUET') AS "
        "SELECT id FROM trips"
    )
    assert spark.read.parquet(out).count() == 3
    # absent flag → errorifexists → must raise, files untouched
    with _pytest.raises(Exception, match="(?i)already exists"):
        gw.execute(
            f"EXPORT DATA OPTIONS(uri='{out}', format='PARQUET') AS "
            "SELECT id FROM trips WHERE id = 1"
        )
    assert spark.read.parquet(out).count() == 3
    with _pytest.raises(Exception, match="(?i)already exists"):
        gw.execute(
            f"EXPORT DATA OPTIONS(uri='{out}', format='PARQUET', "
            "overwrite=false) AS SELECT id FROM trips WHERE id = 1"
        )
    # explicit overwrite=true replaces
    gw.execute(
        f"EXPORT DATA OPTIONS(uri='{out}', format='PARQUET', "
        "overwrite=true) AS SELECT id FROM trips WHERE id = 1"
    )
    assert spark.read.parquet(out).count() == 1


def test_qualify_inside_ctas_and_setop_rejection(spark, tmp_path):
    """QUALIFY inside CTAS text must rewrite the inner SELECT (not wrap
    the whole DDL); a depth-0 set op after QUALIFY raises clearly."""
    import pytest as _pytest

    t = _dml_table(spark, tmp_path, "t11")
    gw = SqlGateway(spark, {"trips": t}, warehouse_root=str(tmp_path / "wh11"))
    gw.execute(
        """CREATE TABLE best AS
           SELECT id, tag, amount FROM trips
           QUALIFY ROW_NUMBER() OVER (ORDER BY amount DESC) = 1"""
    )
    rows = gw.sql("SELECT id, amount FROM best").collect()
    assert [(r["id"], r["amount"]) for r in rows] == [(3, 30.0)]

    with _pytest.raises(ValueError, match="UNION"):
        translate(
            "SELECT id FROM trips QUALIFY ROW_NUMBER() OVER (ORDER BY id) = 1 "
            "UNION ALL SELECT id FROM trips"
        )


def test_percentile_cont_analytic_translation(spark, tmp_path):
    """PRD.md:853's BigQuery spelling `PERCENTILE_CONT(x, f) OVER
    (PARTITION BY …)` → Spark `percentile(x, f) OVER (…)`, same
    interpolated value as the ANSI WITHIN GROUP aggregate."""
    out = translate(
        "SELECT PERCENTILE_CONT(trip_distance, 0.5) "
        "OVER(PARTITION BY EXTRACT(HOUR FROM ts)) AS m FROM t"
    )
    assert "percentile(trip_distance, 0.5) OVER" in out
    assert "PERCENTILE_CONT" not in out
    # WITHIN GROUP single-argument spelling passes through untouched
    keep = translate(
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY v) FROM t"
    )
    assert "percentile_cont(0.5) WITHIN GROUP" in keep

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 10.0), ("b", 4.0), ("b", 8.0)],
        "g string, v double",
    )
    gw = SqlGateway(spark, {"obs": df})
    got = gw.sql(
        """SELECT DISTINCT g,
                  PERCENTILE_CONT(v, 0.5) OVER (PARTITION BY g) AS med
           FROM obs ORDER BY g"""
    ).collect()
    assert [(r["g"], r["med"]) for r in got] == [("a", 2.0), ("b", 6.0)]
