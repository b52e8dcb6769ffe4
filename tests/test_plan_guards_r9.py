"""Round-9 guards: the corpus-clean near-dup stage must AUTO-ROUTE to
the scale-safe LSH path when the exact inverted-index join's fan-out
goes quadratic (VERDICT r8 #1), and the router's estimate must be the
real Σ df² of the join the exact route would run."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators import dedup
from de_gcp_lakehouse_iceberg_spark.operators.corpus import clean_corpus


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )


def _varied(n):
    """Heaps-ish corpus: every doc has its own vocabulary → df ≈ 1."""
    return [
        " ".join(f"w{i}_{j}" for j in range(12)) for i in range(n)
    ]


def _saturated(n):
    """3-word vocabulary: every trigram ubiquitous → Σ df² ≈ rows²."""
    words = ["aa", "bb", "cc"]
    return [
        " ".join(words[(i + j) % 3] for j in range(12)) for i in range(n)
    ]


def test_fanout_stats_match_exact_join(spark):
    """Σ df² from the estimator == the brute-force count over the
    exploded shingle table (same keys the exact join shuffles)."""
    docs = _docs(spark, _varied(20) + _saturated(10))
    rows, df2 = dedup.shingle_fanout_stats(docs)
    ex = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                dedup.doc_keys2_udf(3)(F.col("text"))
            )
        ).alias("sh"),
    )
    brute = (
        ex.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(
            F.sum("d").alias("rows"),
            F.sum(F.col("d") * F.col("d")).alias("df2"),
        )
        .first()
    )
    assert rows == brute["rows"]
    assert df2 == float(brute["df2"])


def test_route_chooser_flips_on_saturation(spark):
    varied = _docs(spark, _varied(200))
    saturated = _docs(spark, _saturated(200))
    assert dedup.choose_jaccard_route(varied) == "exact"
    assert dedup.choose_jaccard_route(saturated) == "lsh"
    # empty corpus: defined, exact (nothing to join either way)
    empty = _docs(spark, []).filter(F.lit(False))
    assert dedup.choose_jaccard_route(empty) == "exact"


def test_clean_corpus_auto_routes_and_matches_forced_routes(spark):
    """On a saturated corpus the default (auto) pipeline must take the
    LSH route AND return the exact route's survivor set — planted dups
    sit far above threshold, where banded-LSH recall ≈ 1."""
    texts = _saturated(60)
    # plant two exact-ish near-dup pairs with distinctive vocabulary
    base = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"
    texts += [base, base + " x13", "y1 y2 y3 y4 y5 y6 y7 y8"]
    docs = _docs(spark, texts)
    assert dedup.choose_jaccard_route(docs) == "lsh"

    auto = {r["doc_id"] for r in clean_corpus(docs).collect()}
    lsh = {r["doc_id"] for r in clean_corpus(docs, use_lsh=True).collect()}
    exact = {r["doc_id"] for r in clean_corpus(docs, use_lsh=False).collect()}
    assert auto == lsh == exact
    assert len(auto) > 0


def test_clean_corpus_auto_keeps_exact_at_gate_scale(spark, sf_dir):
    """Driver fixtures at gate scale stay BELOW the fan-out threshold:
    the default route is the exact oracle-verified baseline (q44's
    hash gate keeps meaning what it meant)."""
    from de_gcp_lakehouse_iceberg_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    kept = docs.filter(F.col("lang").isin(["en", "de", "fr"]))
    assert dedup.choose_jaccard_route(kept) == "exact"


def test_near_dup_pairs_routes_agree(spark):
    """The routed pair source returns the SAME (doc_a, doc_b) set on
    both routes — the invariant that lets q53/q97/q44 keep their exact
    oracles while auto-routing at scale."""
    texts = _saturated(80)
    base = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    texts += [base, base + " p13", base.replace("p1 ", "p1 p1 ")]
    docs = _docs(spark, texts)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.near_dup_pairs(docs, route="exact").collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.near_dup_pairs(docs, route="lsh").collect()
    }
    auto = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.near_dup_pairs(docs).collect()
    }
    assert exact == lsh == auto
    assert len(exact) > 0
