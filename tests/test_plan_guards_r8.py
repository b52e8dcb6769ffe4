"""Plan-shape regression guards for the round-8 text/embedding
operators: the properties that make them 100 TB-safe must be visible
in the physical plan, not just asserted in docstrings."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.plans import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tfidf_and_bm25_use_no_window(spark, sf_dir_medium):
    """Per-group top-k must run through the bounded-state two-phase
    kernel — a Window over the corpus would sort whole partitions."""
    for q in ("q105_tfidf_terms", "q107_bm25_topk"):
        plan = _plan(QUERIES[q](spark, sf_dir_medium))
        assert "Window" not in plan, f"{q} regressed to a Window plan"


def test_bm25_stats_are_broadcast(spark, sf_dir_medium):
    """Corpus stats (idf row, avgdl row) must reach the scoring join
    as broadcasts — a shuffle join against a 1-row side is the
    anti-pattern."""
    plan = _plan(QUERIES["q107_bm25_topk"](spark, sf_dir_medium))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_overlap_matrix_never_joins_the_corpus_with_itself(
    spark, sf_dir_medium
):
    """q108's sketch half must be sketch-vs-sketch arithmetic. The only
    corpus-scale self-join allowed is the EXACT verification column's
    key equi-join; there must be no cartesian product anywhere (the
    20x20 source-pair expansion is a broadcast nested-loop over
    source NAMES, never over corpus rows)."""
    plan = _plan(QUERIES["q108_source_overlap_matrix"](spark, sf_dir_medium))
    assert "CartesianProduct" not in plan


def test_dispersion_matches_bruteforce_pairwise(spark):
    """The ||Σv||² identity == the quadratic definition on a planted
    set (up to the operator's documented 1e-6 centroid quantization)."""
    import itertools

    vecs = {
        0: [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]],
        1: [[0.5, 0.5, 0.0], [0.5, 0.5, 0.0]],
    }
    rows = [
        (int(label), [float(x) for x in v])
        for label, vs in vecs.items()
        for v in vs
    ]
    df = spark.createDataFrame(
        rows, "label int, embedding array<float>"
    ).withColumn("vec_id", F.monotonically_increasing_id())

    from de_gcp_lakehouse_iceberg_spark.plans.dispersion_query import (
        q109_embedding_dispersion,
    )
    import de_gcp_lakehouse_iceberg_spark.tables as tables

    orig = tables.table
    try:
        tables_table = lambda sp, sf, name: df  # noqa: E731
        import de_gcp_lakehouse_iceberg_spark.plans.dispersion_query as dq

        dq.table = tables_table
        got = {
            r["label"]: r["mean_pair_dot"]
            for r in q109_embedding_dispersion(spark, "ignored").collect()
        }
    finally:
        import de_gcp_lakehouse_iceberg_spark.plans.dispersion_query as dq

        dq.table = orig
    for label, vs in vecs.items():
        dots = [
            sum(a * b for a, b in zip(x, y))
            for x, y in itertools.permutations(vs, 2)
        ]
        expect = sum(dots) / (len(vs) * (len(vs) - 1))
        assert abs(got[label] - expect) < 1e-4, (label, got[label], expect)


def test_trigram_fast_udf_equals_expression_form(spark, sf_dir):
    """q108's Arrow keying UDF must stay bit-identical to the
    cross-engine expression anchor (the oracle replays the anchor)."""
    from de_gcp_lakehouse_iceberg_spark.plans.overlap_matrix_query import (
        _trigram_keys,
        trigram_keys_fast,
    )
    from de_gcp_lakehouse_iceberg_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    edge = spark.createDataFrame(
        [("",), ("one",), ("two words",), ("a b c d e",)], "text string"
    )
    for df in (docs.select("text"), edge):
        bad = (
            df.select(
                (
                    _trigram_keys(F.col("text"))
                    == trigram_keys_fast()(F.col("text"))
                ).alias("eq")
            )
            .filter(~F.col("eq"))
            .count()
        )
        assert bad == 0
