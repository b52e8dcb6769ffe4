"""Similarity-search semantics: exact cosine math, top-k determinism,
and the LSH-vs-brute-force recall the driver's rows-only check can't see."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators import similarity
from de_gcp_lakehouse_iceberg_spark.tables import table


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),   # identical to 0 → cosine 1
        (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
        (3, [1.0, 1.0, 0.0]),   # 45° from 0
        (4, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_values_exact(spark):
    df = _vecs(spark)
    out = similarity.brute_force_topk(df, df.filter("vec_id = 0"), k=4)
    got = {r.neighbor_id: r.cosine for r in out.collect()}
    assert got[1] == 1.0
    assert got[2] == 0.0
    assert abs(got[3] - 1 / math.sqrt(2)) < 1e-15
    assert got[4] == -1.0


def test_topk_rank_order_and_tiebreak(spark):
    df = _vecs(spark)
    out = similarity.brute_force_topk(df, df.filter("vec_id = 0"), k=4).collect()
    order = [(r.rank, r.neighbor_id) for r in sorted(out, key=lambda r: r.rank)]
    # cosine desc: 1.0 (id1), 0.707 (id3), 0.0 (id2), -1.0 (id4)
    assert order == [(1, 1), (2, 3), (3, 2), (4, 4)]


def test_self_excluded(spark):
    df = _vecs(spark)
    out = similarity.brute_force_topk(df, df, k=10)
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_nearest_pairs_blocked_finds_identical_pair(spark):
    df = spark.createDataFrame(
        [
            (0, 0, [1.0, 2.0]),
            (1, 0, [1.0, 2.0]),   # same block, identical
            (2, 1, [1.0, 2.0]),   # different block — never paired with 0/1
            (3, 0, [-2.0, 1.0]),
        ],
        "vec_id long, label int, embedding array<float>",
    )
    rows = similarity.nearest_pairs_blocked(df, "label", top_n=3).collect()
    assert (rows[0].id_a, rows[0].id_b) == (0, 1)
    assert abs(rows[0].cosine - 1.0) < 1e-12  # norm(v)² vs dot(v,v) rounding
    assert all({r.id_a, r.id_b} != {1, 2} for r in rows)


def test_lsh_recall_against_brute_force(spark, sf_dir_medium):
    emb = table(spark, sf_dir_medium, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    approx = similarity.lsh_ann_topk(emb, queries, k=10)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # deterministic (seeded planes, fixed data): pin a healthy floor
    assert recall >= 0.5, f"LSH recall@10 degraded to {recall:.2f}"


def test_lsh_cosines_are_exact_for_returned_pairs(spark, sf_dir_medium):
    """LSH approximates the CANDIDATE SET, never the scores: any pair it
    returns must carry the exact cosine the brute-force path computes."""
    emb = table(spark, sf_dir_medium, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.brute_force_topk(emb, queries, k=5000).collect()
    }
    for r in similarity.lsh_ann_topk(emb, queries, k=10).collect():
        assert exact[(r.query_id, r.neighbor_id)] == r.cosine


def test_ivf_recall_and_exact_scores(spark, sf_dir_medium):
    """IVF variant: healthy recall vs brute force, exact cosines for
    every returned pair (candidate set approximate, scores never)."""
    emb = table(spark, sf_dir_medium, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact_pairs = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.brute_force_topk(emb, queries, k=5000).collect()
    }
    exact_top = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, queries, k=10).collect()
    }
    ivf = similarity.ivf_ann_topk(emb, queries, k=10, n_centroids=32, nprobe=8).collect()
    got = {(r.query_id, r.neighbor_id) for r in ivf}
    recall = len(got & exact_top) / len(exact_top)
    assert recall >= 0.4, f"IVF recall@10 degraded to {recall:.2f}"
    for r in ivf:
        assert exact_pairs[(r.query_id, r.neighbor_id)] == r.cosine


def test_sq8_ann_recall_vs_bruteforce(spark, sf_dir):
    from de_gcp_lakehouse_iceberg_spark.operators.similarity import (
        brute_force_topk,
        sq8_topk,
    )
    from de_gcp_lakehouse_iceberg_spark.tables import table
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in sq8_topk(emb, queries, k=10, rerank=30).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall  # int8 + rerank=3k must be near-exact
    # rerank = corpus size ⇒ identical to brute force
    n = emb.count()
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in sq8_topk(emb, queries, k=10, rerank=n).collect()
    }
    assert full == exact


def test_sq8_codes_bounds_and_determinism(spark, sf_dir):
    from de_gcp_lakehouse_iceberg_spark.operators.similarity import (
        sq8_codes_udf,
        sq8_train,
    )
    from de_gcp_lakehouse_iceberg_spark.tables import table
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    mins, maxs = sq8_train(emb)
    codes = emb.select(
        "vec_id", sq8_codes_udf(mins, maxs)(F.col("embedding")).alias("c")
    )
    stats = codes.select(
        F.min(F.array_min("c")).alias("lo"),
        F.max(F.array_max("c")).alias("hi"),
        F.countDistinct(F.size("c")).alias("dims"),
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] <= 255 and stats["dims"] == 1
    # per-dim extremes map to 0 / 255 (the codebook is tight)
    assert stats["lo"] == 0 and stats["hi"] == 255


def test_pair_dot_udf_bit_identical_to_fold(spark, sf_dir):
    """The Arrow pair-dot fast path must reproduce the expression
    fold's doubles EXACTLY (same per-dimension accumulation order) —
    any ULP drift would change ranks vs the DuckDB oracles."""
    from pyspark.sql import functions as F

    from de_gcp_lakehouse_iceberg_spark.operators.similarity import (
        dot,
        pair_dot_udf,
    )
    from de_gcp_lakehouse_iceberg_spark.tables import table

    emb = table(spark, sf_dir, "embeddings").limit(200)
    a = emb.select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("eb")
    )
    pairs = a.join(b, F.col("ia") < F.col("ib")).limit(5000)
    pdot = pair_dot_udf()
    rows = pairs.select(
        dot(F.col("ea"), F.col("eb")).alias("expr"),
        pdot(F.col("ea"), F.col("eb")).alias("arrow"),
    ).collect()
    assert rows and all(r["expr"] == r["arrow"] for r in rows)


def test_nearest_pairs_chunk_route_equals_block_route(spark, monkeypatch):
    """r12: the few-big-blocks route distributes each block's
    accumulator chunks across tasks; rows must be IDENTICAL to the
    one-task-per-block route (same dimension-sequential fold per pair,
    local top-n supersets), and auto must flip on big blocks. Block
    size 3100 > 8M/3100 forces GENUINE multi-chunk spans (2 chunks per
    block) through the SQL chunk map."""
    import numpy as np

    from de_gcp_lakehouse_iceberg_spark.operators import similarity as sim

    rng = np.random.default_rng(5)
    rows = [
        (i, int(i % 2), [float(x) for x in rng.standard_normal(4)])
        for i in range(6200)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    assert sim._chunk_rows_for(3100) < 3100  # really multi-chunk

    block = sim.nearest_pairs_blocked(
        df, "label", top_n=15, parallelism="block"
    )
    want = [tuple(r) for r in block.collect()]
    assert len(want) == 15

    chunk = sim.nearest_pairs_blocked(
        df, "label", top_n=15, parallelism="chunk"
    )
    assert [tuple(r) for r in chunk.collect()] == want

    # auto flips to the chunk route once a block exceeds the bound
    monkeypatch.setattr(sim, "PAIRS_CHUNK_WHEN_BLOCK_EXCEEDS", 100)
    auto = sim.nearest_pairs_blocked(df, "label", top_n=15)
    assert [tuple(r) for r in auto.collect()] == want


def test_nearest_pairs_tie_band_survives_matmul_selection(spark):
    """r13: candidate SELECTION runs on a BLAS matmul whose result can
    differ from the exact dimension-sequential fold by ~1e-15; the
    survivors are re-scored exactly. Stress the cut with a fixture
    whose top-n boundary is a THICK TIE BAND (many duplicated vectors
    → byte-identical cosines straddling the cut): selection must keep
    the whole band (the _MATMUL_EPS margin) and the emitted rows must
    equal the oracle-shape brute force built in numpy with the same
    sequential fold, including every tie at the kth place."""
    import numpy as np

    from de_gcp_lakehouse_iceberg_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    base = rng.standard_normal((12, 8))
    # 60 vectors = each base vector repeated 5x: duplicate pairs tie at
    # cosine 1.0 and every cross pair's cosine occurs 25x — the top-20
    # cut lands INSIDE a tie class, the worst case for approx selection
    V = np.repeat(base, 5, axis=0)
    rows = [
        (i, 0, [float(x) for x in V[i]]) for i in range(len(V))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )

    def fold_norm(a):
        acc = 0.0
        for k in range(len(a)):  # norm() is a sequential fold too
            acc += a[k] * a[k]
        return np.sqrt(acc)

    def fold_cos(a, b):
        acc = 0.0
        for k in range(len(a)):  # the oracle's sequential fold
            acc += a[k] * b[k]
        return acc / (fold_norm(a) * fold_norm(b))

    exact = sorted(
        (
            (fold_cos(V[i], V[j]), i, j)
            for i in range(len(V))
            for j in range(i + 1, len(V))
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    for par in ("block", "chunk"):
        got = [
            (r.id_a, r.id_b, r.cosine)
            for r in sim.nearest_pairs_blocked(
                df, "label", top_n=20, parallelism=par
            ).collect()
        ]
        assert got == [(i, j, c) for c, i, j in exact[:20]], par
