"""Distributed k-means (Lloyd's algorithm) over an embedding column —
the clustering primitive behind IVF index builds, corpus bucketing, and
diversity sampling in training-data pipelines (the reference has no ML
surface; this extends SURVEY.md §7.1 step 10's similarity family).

Cross-engine determinism (the driver hash-compares against a DuckDB
oracle that unrolls the same iterations):

- vectors are fixed-point quantized ONCE (``q = floor(x·QUANT + 0.5)``,
  the same trick operators/similarity.py uses) — every cross-row
  aggregate (the per-dimension component sums that form new centroids)
  is then an INTEGER sum: exact and order-independent, so shuffle
  order cannot perturb the result;
- per-row math (squared-L2 distance to each centroid, centroid norms)
  accumulates DIMENSION-SEQUENTIALLY in DOUBLE — fixed evaluation
  order, bit-identical to DuckDB's ``list_sum`` fold (the q38 cosine
  oracle pins this equivalence). The fold has two implementations
  with identical per-element op order: the Catalyst ``F.aggregate``
  form (``assign_mode="fold"`` — the oracle-shaped anchor) and the
  r13 DEFAULT Arrow form (``"exact"`` — the same sequential
  accumulation vectorized across batch rows in numpy, no BLAS/SIMD
  reordering anywhere; equality pinned in tests/test_clustering.py);
- assignment ties break to the lowest centroid id; empty clusters keep
  their previous centroid.

Scale posture: per iteration, assignment is k·d doubles against a
narrow projection (broadcast join for the fold form, a worker closure
for the Arrow forms — no shuffle either way), and the update is ONE
shuffle of (k·d) integer partial sums — map-side combine reduces each
partition to ≤ k·d rows before the exchange.
``kmeans(..., fast=True)`` swaps the assignment for the Arrow
numpy-MATMUL path (same vectorized shape as operators/similarity.py)
for bulk scoring at 100 TB — kept out of the default because BLAS
summation order can flip argmin on exact near-ties, and the driver
oracle (q58) pins fold semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .similarity import QUANT


def quantize(vec_col, quant: int = QUANT):
    """float array → integer fixed-point array (deterministic in any
    engine: floor(x·Q + 0.5) on the double-widened component)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * quant + F.lit(0.5)).cast("long")
    )


def _sq_dist(a, b):
    """Sequential-fold squared L2 distance in double (fixed dim order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = QUANT,
    fast: bool = False,
    assign_mode: str | None = None,
) -> DataFrame:
    """Lloyd's k-means on the quantized vectors; returns the final
    assignment (id_col, cluster_id, dist) after `iters` update rounds.

    Init: centroids = the k lowest-id vectors (deterministic and
    engine-independent; at scale swap for a seeded hash-sample — the
    published k-means|| init is a drop-in here).

    fast=True swaps the per-row Catalyst fold for the Arrow-batched
    numpy path (``||x||² − 2·X·Cᵀ + ||c||²`` matmul per batch — the
    same vectorized shape operators/similarity.py uses): one
    mapInPandas pass, centroids shipped to workers as a k·d closure
    array, still zero shuffle for assignment. This is the bulk-scoring
    route for 100 TB; the default stays on the fold because BLAS
    summation order can flip argmin on exact near-ties, and the driver
    oracle (q58) pins fold semantics. Parity on non-degenerate data is
    asserted in tests/test_clustering.py."""
    qv = vectors.select(
        F.col(id_col).alias("vec_id"), quantize(vec_col, quant).alias("q")
    )
    # init: k lowest ids, cluster ids 0..k-1 in vec_id order
    centroids = (
        qv.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(W.orderBy("vec_id")) - 1).alias("cid"),
            F.transform("q", lambda x: x.cast("double")).alias("c"),
        )
    )

    def assign_fold(cents: DataFrame) -> DataFrame:
        # argmin via struct-MIN, not a row_number window: struct
        # ordering compares (dist, cid) lexicographically, so the
        # minimum IS "lowest dist, ties to lowest cid" — the same
        # deterministic rule, but as an aggregate it partial-combines
        # map-side (each partition collapses its k candidate rows per
        # vector to 1 BEFORE the exchange) and needs no sort. The
        # window form shuffled and sorted all N×k scored rows — at
        # k ∝ N (SemDeDup deployment shape) that exchange, not the
        # distance math, dominated the round-10 measurement.
        scored = qv.join(F.broadcast(cents)).select(
            "vec_id", "q", "cid", _sq_dist(F.col("q"), F.col("c")).alias("dist")
        )
        return (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cid", "q")).alias("b"))
            .select(
                "vec_id",
                F.col("b.q").alias("q"),
                F.col("b.cid").alias("cid"),
                F.col("b.dist").alias("dist"),
            )
        )

    def assign_fast(cents: DataFrame) -> DataFrame:
        # k·d doubles to the driver (bounded by k, like the IVF build),
        # then one Arrow pass: n×k distances per batch via matmul,
        # argmin ties break to the lowest cid for free (rows are
        # cid-sorted and numpy argmin takes the first minimum).
        import numpy as np
        import pandas as pd

        rows = cents.orderBy("cid").collect()
        C = np.array([r["c"] for r in rows], dtype=np.float64)
        cids = np.array([r["cid"] for r in rows], dtype=np.int64)
        cn = (C * C).sum(axis=1)

        def score(batches):
            for pdf in batches:
                X = np.array(pdf["q"].tolist(), dtype=np.float64)
                d2 = np.maximum(
                    (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + cn[None, :],
                    0.0,
                )
                j = d2.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "q": pdf["q"],
                        "cid": cids[j],
                        "dist": d2[np.arange(len(j)), j],
                    }
                )

        return qv.mapInPandas(
            score, schema="vec_id long, q array<long>, cid int, dist double"
        )

    def assign_exact(cents: DataFrame) -> DataFrame:
        # r13 default: the Catalyst fold's EXACT semantics, Arrow-
        # batched. Per centroid, the squared-L2 accumulates dimension-
        # sequentially in double ((x_k − c_k)² added in dim order —
        # the same per-element op order as the `_sq_dist` fold, so
        # results are BIT-IDENTICAL; no BLAS/SIMD reordering anywhere),
        # vectorized across the batch rows. Argmin scans centroids in
        # cid order with a strict < update, which IS the struct-MIN
        # rule (lowest dist, ties to lowest cid). k·d doubles to the
        # driver per iteration — bounded, same as assign_fast.
        # Equality with assign_fold is pinned by
        # tests/test_clustering.py::test_exact_assign_equals_fold.
        import numpy as np
        import pandas as pd

        rows = cents.orderBy("cid").collect()
        C = np.array([r["c"] for r in rows], dtype=np.float64)
        cids = np.array([r["cid"] for r in rows], dtype=np.int64)

        def score(batches):
            for pdf in batches:
                X = np.array(pdf["q"].tolist(), dtype=np.float64)
                n, d = X.shape if len(X) else (0, C.shape[1])
                if n == 0:
                    continue
                best_d = None
                best_c = None
                for ci in range(len(C)):
                    acc = np.zeros(n, dtype=np.float64)
                    for kk in range(d):  # dimension-sequential == fold
                        diff = X[:, kk] - C[ci, kk]
                        acc += diff * diff
                    if best_d is None:
                        best_d = acc
                        best_c = np.full(n, cids[ci], dtype=np.int64)
                    else:
                        better = acc < best_d  # ties keep lower cid
                        best_d = np.where(better, acc, best_d)
                        best_c = np.where(better, cids[ci], best_c)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "q": pdf["q"],
                        "cid": best_c,
                        "dist": best_d,
                    }
                )

        return qv.mapInPandas(
            score, schema="vec_id long, q array<long>, cid int, dist double"
        )

    routes = {
        "fast": assign_fast,
        "fold": assign_fold,
        "exact": assign_exact,
    }
    if assign_mode is not None and assign_mode not in routes:
        raise ValueError(
            f"assign_mode must be one of {sorted(routes)}, got {assign_mode!r}"
        )
    if fast and assign_mode not in (None, "fast"):
        # `fast=True` is sugar for assign_mode="fast"; a conflicting
        # explicit mode must fail loudly, not silently win
        raise ValueError(
            f"fast=True conflicts with assign_mode={assign_mode!r}; "
            "pass one or the other"
        )
    mode = assign_mode or ("fast" if fast else "exact")
    assign = routes[mode]

    for _ in range(iters):
        assigned = assign(centroids)
        # integer partial sums per (cluster, dim) — order-independent;
        # mean = exact integer sum widened to double / count
        sums = (
            assigned.select("cid", F.posexplode("q").alias("pos", "comp"))
            .groupBy("cid", "pos")
            .agg(F.sum("comp").alias("s"), F.count("*").alias("n"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "s", "n"))
                    ),
                    lambda t: t["s"].cast("double") / t["n"],
                ).alias("c")
            )
        )
        # empty clusters keep their previous centroid
        centroids = (
            centroids.alias("old")
            .join(sums.alias("new"), "cid", "left")
            .select("cid", F.coalesce("new.c", "old.c").alias("c"))
        ).localCheckpoint()
    return assign(centroids).select("vec_id", "cid", "dist")


def semdedup(
    vectors: DataFrame,
    k: int | None = 8,
    tau: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fast: bool = False,
    iters: int = 0,
    target_cluster_size: int = 250,
) -> DataFrame:
    """SemDeDup-style clustered embedding near-dedup (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): assign every vector to its nearest of k seed
    centroids (one broadcast pass, `kmeans(iters=0)`), then compare
    pairs ONLY within a cluster — pair volume is Σ c_i² instead of n²,
    and k scales with the corpus so clusters stay bounded at 100 TB.

    Returns (vec_id, cid, is_dup): `is_dup` marks vectors that appear
    as the HIGHER id in any same-cluster pair with cosine ≥ tau. This
    keep-the-lowest-id rule is order-independent (unlike greedy
    scan-order dedup), so shuffle order can't change the result — the
    property that lets a SQL oracle replay it exactly.

    Shuffle shape: assignment is broadcast-only; the pair stage
    shuffles each side once on cid (skewed clusters fall to AQE), and
    cosine runs as the same sequential fold the q38/q39 oracles pin.

    `k=None` is the DEPLOYMENT route (the k∝N shape SCALE.md
    round-10 measures at 1.78× wall for 3× data): k is sized so
    clusters average `target_cluster_size` vectors — within-cluster
    pair work stays ~N·target instead of N²/k — and assignment takes
    the Arrow matmul path (the interpreted fold scores N·k rows, so at
    scaled k the fold, not the pair stage, would dominate: measured
    148 s vs 3.5 s at the sf3 fixture). The k=8 fold default stays the
    oracle gate shape (q70 pins its sequential-fold semantics).
    """
    if k is None:
        n_vecs = vectors.count()  # one cheap metadata-ish aggregate
        k = max(8, -(-n_vecs // target_cluster_size))
        fast = True
    assigned = kmeans(
        vectors, k=k, iters=iters, id_col=id_col, vec_col=vec_col, fast=fast
    )
    from .similarity import cosine, with_norm

    n = with_norm(
        vectors.select(F.col(id_col).alias("vec_id"), vec_col), vec_col
    )
    m = assigned.select("vec_id", "cid").join(n, "vec_id")
    # Per-cluster GEMM dup detection (same shape as
    # similarity.nearest_pairs_blocked): each cluster's c_i ROWS ship
    # once into a grouped pandas scorer; the c_i × c_i cosine matrix
    # accumulates DIMENSION-SEQUENTIALLY in float64, so every pair's
    # double — and therefore the ≥ tau decision — is bit-identical to
    # the cosine() expression fold the SQL oracle replays. A pair JOIN
    # here would shuffle O(Σ c_i²) rows each dragging two vectors;
    # this shuffles O(rows).
    import numpy as np
    import pandas as pd

    grouped = m.select(
        "cid",
        F.col("vec_id").alias("_id"),
        F.col(vec_col).alias("_vec"),
        "_norm",
    )

    def find_dups(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        c = len(pdf)
        if c < 2:
            return pd.DataFrame({"id_b": []})
        A = np.vstack(pdf["_vec"].to_numpy()).astype(np.float64)
        norms = pdf["_norm"].to_numpy(dtype=np.float64)
        ids = pdf["_id"].to_numpy()
        d = A.shape[1]
        dup = np.zeros(c, dtype=bool)
        chunk = max(1, min(c, 8 * 1024 * 1024 // max(c, 1)))
        for s in range(0, c, chunk):
            e = min(c, s + chunk)
            acc = np.zeros((e - s, c), dtype=np.float64)
            for k2 in range(d):  # dimension-sequential == the fold
                acc += np.multiply.outer(A[s:e, k2], A[:, k2])
            cosm = acc / np.multiply.outer(norms[s:e], norms)
            mask = (cosm >= tau) & (
                np.arange(c)[None, :] > np.arange(s, e)[:, None]
            )
            dup |= mask.any(axis=0)
        return pd.DataFrame({"id_b": ids[dup]})

    from pyspark.sql.types import StructField, StructType

    dups = (
        grouped.groupBy("cid")
        .applyInPandas(
            find_dups,
            StructType(
                [StructField("id_b", m.schema["vec_id"].dataType)]
            ),
        )
        .withColumn("is_dup", F.lit(True))
    )
    return (
        assigned.select("vec_id", "cid")
        .join(dups, assigned.vec_id == dups.id_b, "left")
        .select(
            "vec_id", "cid", F.coalesce("is_dup", F.lit(False)).alias("is_dup")
        )
    )
