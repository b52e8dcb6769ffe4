"""Property-based check: asof_join must agree with pandas.merge_asof
(the published reference implementation of backward as-of semantics)
on arbitrary generated inputs — keys, timestamps, tolerances."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from de_gcp_lakehouse_iceberg_spark.operators.asof import asof_join

_BASE = dt.datetime(2025, 1, 1)

_row = st.tuples(
    st.integers(min_value=0, max_value=3),          # key
    st.integers(min_value=0, max_value=3_600),      # seconds offset
)


def _mk(rows):
    return [
        (i, k, _BASE + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(rows)
    ]


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(_row, min_size=1, max_size=12),
    right=st.lists(_row, min_size=1, max_size=12),
    tol=st.one_of(st.none(), st.integers(min_value=0, max_value=1_200)),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, tol):
    lrows = _mk(left)
    # two right rows at the same (key, ts) have no defined winner in
    # either engine — dedupe so the property stays well-posed
    seen: set = set()
    rrows = []
    for row in _mk(right):
        if (row[1], row[2]) not in seen:
            seen.add((row[1], row[2]))
            rrows.append(row)
    ldf = spark.createDataFrame(lrows, "id long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        [(rid + 1000, k, ts) for rid, k, ts in rrows],
        "rid long, k long, rts timestamp",
    )
    got = {
        r.id: r.asof_rid
        for r in asof_join(
            ldf, rdf, by=["k"], left_ts="ts", right_ts="rts",
            right_cols=["rid"],
            tolerance_seconds=tol,
        ).collect()
    }

    lp = pd.DataFrame(lrows, columns=["id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(
        [(rid + 1000, k, ts) for rid, k, ts in rrows],
        columns=["rid", "k", "rts"],
    ).sort_values("rts")
    merged = pd.merge_asof(
        lp,
        rp,
        left_on="ts",
        right_on="rts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    want = {
        int(row.id): (None if pd.isna(row.rid) else int(row.rid))
        for row in merged.itertuples()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    left=st.lists(_row, min_size=1, max_size=10),
    right=st.lists(_row, min_size=1, max_size=10),
    lower=st.integers(min_value=0, max_value=1_800),
)
def test_interval_join_matches_bruteforce(spark, left, right, lower):
    from de_gcp_lakehouse_iceberg_spark.streaming.interval_join import (
        interval_join,
    )

    lrows, rrows = _mk(left), _mk(right)
    ldf = spark.createDataFrame(lrows, "id long, k long, ts timestamp")
    rdf = spark.createDataFrame(
        [(rid + 1000, k, ts) for rid, k, ts in rrows],
        "rid long, k long, rts timestamp",
    )
    got = {
        (r.id, r.rid)
        for r in interval_join(
            ldf, rdf, by=["k"], left_ts="ts", right_ts="rts",
            lower_seconds=lower,
        ).collect()
    }
    want = {
        (lid, rid + 1000)
        for lid, lk, lts in lrows
        for rid, rk, rts in rrows
        if lk == rk and 0 <= (lts - rts).total_seconds() <= lower
    }
    assert got == want
