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
