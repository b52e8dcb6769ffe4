"""Property-based check: grouped_topk (every route) must agree with
the row_number-window reference on arbitrary generated inputs —
duplicate scores, negative values, NULL order keys, NULL groups,
groups smaller and larger than k."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators.topk import grouped_topk

_row = st.tuples(
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # group
    st.one_of(st.none(), st.integers(-50, 50)),              # score
)


def _reference(rows, k):
    """The window form's rows: per group, sort by (score NULLS FIRST,
    id) ascending, keep k, rank 1-based."""
    import itertools

    out = []
    keyf = lambda r: r[0] or ""  # noqa: E731 — None groups bucket ""
    for g, grp in itertools.groupby(
        sorted(rows, key=lambda r: (keyf(r), 0)), key=lambda r: r[0]
    ):
        grp = sorted(
            grp, key=lambda r: (r[1] is not None, r[1] or 0, r[2])
        )
        out += [(g, i + 1, r[1], r[2]) for i, r in enumerate(grp[:k])]
    return sorted(out, key=lambda t: (t[0] or "", t[1]))


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(_row, min_size=0, max_size=60),
    k=st.integers(1, 5),
)
def test_grouped_topk_matches_reference_all_routes(spark, rows, k):
    data = [(g, s, i) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "g string, score int, id long"
    ) if data else spark.createDataFrame([], "g string, score int, id long")
    want = _reference(data, k)
    for kw in ({}, {"payload": "rejoin"}, {"route": "single"}):
        got = sorted(
            (
                (r.g, r.rank, r.score, r.id)
                for r in grouped_topk(
                    df, ["g"], [F.col("score"), F.col("id")], k, **kw
                ).collect()
            ),
            key=lambda t: (t[0] or "", t[1]),
        )
        assert got == want, (kw, got, want)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rejoin_broadcast_is_size_gated(spark, monkeypatch):
    """r11 VERDICT #6: the rejoin route's winner broadcast ships
    k x #groups rows — with many groups it must fall back to a plain
    shuffled join (Spark/AQE picks), results staying identical."""
    from de_gcp_lakehouse_iceberg_spark.operators import topk as topk_mod

    df = spark.range(3000).select(
        (F.col("id") % 500).alias("g"),
        (F.col("id") * 2654435761 % 997).alias("score"),
        F.col("id"),
    )
    order = [F.col("score"), F.col("id")]

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # under the bound (default): winners broadcast despite conf -1
        small = grouped_topk(df, ["g"], order, 2, payload="rejoin")
        assert "BroadcastHashJoin" in _plan(small)
        rows_small = sorted(map(tuple, small.collect()))

        # above the bound: the hint is gone, the join shuffles
        monkeypatch.setattr(topk_mod, "REJOIN_BROADCAST_WINNERS", 100)
        big = grouped_topk(df, ["g"], order, 2, payload="rejoin")
        assert "BroadcastHashJoin" not in _plan(big)
        assert sorted(map(tuple, big.collect())) == rows_small

        # caller-supplied cardinality hint sizes without counting:
        # 500 groups x k=2 = 1000 > 100 -> shuffled; 10 -> broadcast
        hinted_big = grouped_topk(
            df, ["g"], order, 2, payload="rejoin", groups_hint=500
        )
        assert "BroadcastHashJoin" not in _plan(hinted_big)
        hinted_small = grouped_topk(
            df, ["g"], order, 2, payload="rejoin", groups_hint=10
        )
        assert "BroadcastHashJoin" in _plan(hinted_small)
        assert sorted(map(tuple, hinted_big.collect())) == rows_small
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # results also match the carry route (the oracle-checked form)
    carry = grouped_topk(df, ["g"], order, 2, payload="carry")
    assert (
        sorted(tuple(r) for r in carry.select(*small.columns).collect())
        == rows_small
    )
