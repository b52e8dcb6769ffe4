"""Similarity search over embedding columns (`array<float>`) —
brute-force cosine top-k baseline plus a random-hyperplane-LSH bucketed
variant as the scale path (SURVEY.md §7.1 step 10).

Numeric determinism: cosine is computed with a fixed operation order —
sequential fold for the dot product and squared norms, then
``dot / (norm_a · norm_b)`` — which the DuckDB oracle mirrors exactly
(list_sum folds the same way), giving bit-identical doubles, so rank
orders agree across engines without tolerance hacks.

Scale posture:
- **brute force**: score is a narrow per-pair projection; the only
  shuffle is the per-query top-k. Broadcast the (small) query set; the
  corpus never moves. At 100 TB corpus you batch the query set and keep
  AQE on for the rank shuffle. This is the exact baseline an ANN path
  must be measured against.
- **LSH ANN**: H deterministic hyperplanes → H sign bits → bucket key.
  Candidates = corpus rows sharing the query's bucket (multi-probe:
  also buckets at Hamming distance 1). Scoring cost drops by the bucket
  fan-out factor; the bucket join is an equi-join (hash-partitioned, no
  cross product). Recall is tunable via H and probes; verified against
  brute force in tests/test_similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    """Sequential double fold — fixed order, cross-engine reproducible."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def pair_dot_udf():
    """Arrow fast path for PAIR-stage dot products, bit-identical to
    the `dot()` expression fold: the fold is a LEFT-sequential float64
    accumulation over dimensions, so accumulating dimension-by-
    dimension with a float64 numpy vector (vectorized over the ROWS of
    the batch) performs the exact same additions in the exact same
    order per pair — same doubles, ~10× less interpreter overhead than
    Catalyst's interpreted higher-order lambda on the O(pairs) hot
    path (the O(rows) norm stays on the expression form). Equality is
    pinned in tests/test_similarity.py."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _pair_dot(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series(np.zeros(0, dtype=np.float64))
        A = np.vstack(va.to_numpy())
        B = np.vstack(vb.to_numpy())
        acc = np.zeros(len(va), dtype=np.float64)
        for d in range(A.shape[1]):
            acc += A[:, d].astype(np.float64) * B[:, d].astype(np.float64)
        return pd.Series(acc)

    return _pair_dot


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the L2 norm once per row (narrow projection)."""
    return df.withColumn("_norm", norm(F.col(vec_col)))


def _topk_per_query(
    scored: DataFrame, k: int, route: str = "bounded"
) -> DataFrame:
    """Top-k by cosine DESC (ties to lowest neighbor_id) per query over
    a (query_id, neighbor_id, cosine) relation — grouped_topk, not a
    row_number window: a hot query's whole candidate list never lands
    in one sort task (operators/topk.py rationale). Callers whose
    candidate generation CAPS the per-query group (IVF nprobe x list,
    SQ8 rerank cutoff) pass route="single" — one all-JVM shuffle,
    measured fastest at those group sizes; brute-force scans AND the
    LSH path keep the default bounded route (LSH bucket fan-out is not
    hard-capped — a hot bucket makes per-query candidate lists
    corpus-scale, and the measured single-route cost already inverts
    at sf0.1). Negated-cosine ascending == cosine descending; a NaN score
    (zero vector) would sort LAST here instead of the window-desc
    form's first — saner for similarity top-k, and unreachable on
    unit-norm input (tests)."""
    from .topk import grouped_topk

    return grouped_topk(
        scored,
        ["query_id"],
        [(-F.col("cosine")), F.col("neighbor_id")],
        k,
        route=route,
    ).select("query_id", "neighbor_id", "cosine", "rank")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k most-similar corpus
    rows (self excluded), rank ties broken by neighbor id.

    Output: (query_id, neighbor_id, cosine, rank).
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")).alias(
                "cosine"
            ),
        )
    )
    return _topk_per_query(scored, k)


# nearest_pairs_blocked auto-route: distribute each block's chunk loop
# across tasks once any block exceeds this many rows. Below it one
# task per block already saturates (and the chunk route's extra counts
# aggregate + duplicating join is pure overhead); above it a handful
# of big blocks strands the cores — sf3 measured 10 label blocks of
# ~6.1k rows on 32 cores: 89.6 s block-route vs the chunked route's
# ~5x task fan-out. Any chunking yields the SAME result: a global
# top-n pair is within its chunk's local top-n (ties kept), and each
# pair's double is computed by the same dimension-sequential fold no
# matter which chunk owns it.
PAIRS_CHUNK_WHEN_BLOCK_EXCEEDS = 4096


# Safety margin for matmul-based candidate SELECTION (never scoring):
# |dgemm − sequential fold| ≤ ~d·u·Σ|a||b| ≈ 7e-15 for unit vectors at
# d = 64; 1e-9 dominates it by 10^5 while sitting far below any cosine
# gap the 6-dp output rounding could surface. Survivors are re-scored
# with the exact fold, so this widens the candidate band only.
_MATMUL_EPS = 1e-9


def _chunk_rows_for(c: int) -> int:
    """Rows per accumulator chunk: keep each chunk x block float64
    accumulator at or under ~64 MB (the block route's original bound)."""
    return max(1, min(c, 8 * 1024 * 1024 // max(c, 1)))


def nearest_pairs_blocked(
    corpus: DataFrame,
    block_col: str,
    top_n: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    parallelism: str = "auto",
) -> DataFrame:
    """Embedding near-dup detection, blocked: score all pairs *within a
    block* (e.g. a cluster/label/shard key) and keep the global top-N
    most similar. Blocking turns the quadratic all-pairs into per-block
    quadratics — the standard way to make embedding near-dup tractable;
    the block key at 100 TB comes from a coarse clustering or LSH bucket.

    parallelism: "block" — one task per block (the natural shape while
    blocks are numerous relative to cores); "chunk" — each block's
    accumulator chunks become separate tasks (one narrow counts
    aggregate + a duplicating join, fan-out c/chunk per block), for
    the few-big-blocks regime; "auto" — chunk once any block exceeds
    PAIRS_CHUNK_WHEN_BLOCK_EXCEEDS rows. All routes produce the
    identical rows: every pair's cosine is the same dimension-
    sequential numpy fold (bit-identical to the oracle's list fold,
    pinned in tests/test_similarity.py), and per-chunk local top-n
    with ties kept is a superset of the global top-n.
    """
    n = with_norm(corpus, vec_col)
    # Per-block GEMM instead of a pair JOIN: the join shape shuffles
    # O(Σ c_i²) pair rows each dragging TWO vectors; this shape
    # shuffles each block's c_i ROWS once (x fan-out on the chunk
    # route) and forms the pair matrix in numpy.
    from pyspark.sql.types import DoubleType, StructField, StructType

    grouped_in = n.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        "_norm",
    )
    out_schema = StructType(
        [
            StructField(block_col, n.schema[block_col].dataType),
            StructField("id_a", n.schema[id_col].dataType),
            StructField("id_b", n.schema[id_col].dataType),
            StructField("cosine", DoubleType()),
        ]
    )

    def _score_span(pdf: pd.DataFrame, lo: int, hi: int) -> pd.DataFrame:
        """Pairs (i, j) with lo <= i < hi, i < j < c, over the block
        rows in pdf (sorted by _id): the accumulator loop of the
        original block route, restricted to one row span."""
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        c = len(pdf)
        empty = pd.DataFrame(
            {block_col: [], "id_a": [], "id_b": [], "cosine": []}
        )
        if c < 2:
            return empty
        hi = min(hi, c)
        if lo >= hi:
            return empty
        A = np.vstack(pdf["_vec"].to_numpy()).astype(np.float64)
        norms = pdf["_norm"].to_numpy(dtype=np.float64)
        ids = pdf["_id"].to_numpy()
        d = A.shape[1]
        outs = []
        chunk = _chunk_rows_for(c)
        for s in range(lo, hi, chunk):
            e = min(hi, s + chunk)
            # SELECTION via one BLAS matmul (r13: 20x+ over the d-pass
            # outer-product loop), then EXACT re-score of only the
            # surviving band with the dimension-sequential fold — so
            # every EMITTED cosine stays bit-identical to the oracle's
            # list fold. _MATMUL_EPS (1e-9) dominates the dgemm error
            # bound (~d·u ≈ 7e-15 for unit vectors) by 10^5, so the
            # approx cut can never drop a pair the exact cut keeps.
            cosm = (A[s:e] @ A.T) / np.multiply.outer(norms[s:e], norms)
            ii, jj = np.nonzero(
                np.arange(c)[None, :] > np.arange(s, e)[:, None]
            )
            cos_a = cosm[ii, jj]
            if len(cos_a) > top_n:
                kth = np.partition(cos_a, len(cos_a) - top_n)[
                    len(cos_a) - top_n
                ]
                keep = cos_a >= kth - _MATMUL_EPS
                ii, jj = ii[keep], jj[keep]
            # exact dimension-sequential fold on the survivors only
            gi = ii + s
            acc = np.zeros(len(ii), dtype=np.float64)
            for k in range(d):
                acc += A[gi, k] * A[jj, k]
            cos = acc / (norms[gi] * norms[jj])
            if len(cos) > top_n:
                kth = np.partition(cos, len(cos) - top_n)[len(cos) - top_n]
                keep = cos >= kth  # ties at the cut retained
                ii, jj, cos = ii[keep], jj[keep], cos[keep]
            outs.append(
                pd.DataFrame(
                    {
                        block_col: np.repeat(pdf["_blk"].iloc[0], len(cos)),
                        "id_a": ids[ii + s],
                        "id_b": ids[jj],
                        "cosine": cos,
                    }
                )
            )
        out = pd.concat(outs, ignore_index=True)
        order = np.lexsort(
            (out["id_b"], out["id_a"], -out["cosine"].to_numpy())
        )
        return out.iloc[order[: top_n]]

    if parallelism not in ("auto", "block", "chunk"):
        raise ValueError(
            f"parallelism must be auto|block|chunk: {parallelism!r}"
        )
    sizes = None
    if parallelism == "auto":
        sizes = grouped_in.groupBy("_blk").agg(
            F.count(F.lit(1)).alias("_c")
        )
        biggest = sizes.agg(F.max("_c")).first()[0] or 0
        parallelism = (
            "chunk"
            if biggest > PAIRS_CHUNK_WHEN_BLOCK_EXCEEDS
            else "block"
        )

    if parallelism == "block":

        def score(pdf: pd.DataFrame) -> pd.DataFrame:
            return _score_span(pdf, 0, len(pdf))

        pairs = grouped_in.groupBy("_blk").applyInPandas(score, out_schema)
    else:
        # one task per (block, accumulator chunk): duplicate each
        # block's rows once per chunk through a broadcast join on the
        # (tiny) chunk map, so a handful of big blocks fans out to
        # all cores instead of stranding one task per block
        if sizes is None:
            sizes = grouped_in.groupBy("_blk").agg(
                F.count(F.lit(1)).alias("_c")
            )
        chunk_rows = (
            F.greatest(
                F.lit(1),
                F.least(
                    F.col("_c"),
                    F.floor(F.lit(8 * 1024 * 1024) / F.col("_c")),
                ),
            )
        ).cast("long")
        chunks = sizes.select(
            "_blk",
            chunk_rows.alias("_cr"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.col("_c") / chunk_rows).cast("long") - 1,
                )
            ).alias("_ck"),
        )
        dup = grouped_in.join(F.broadcast(chunks), "_blk")

        def score_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
            cr = int(pdf["_cr"].iloc[0])
            ck = int(pdf["_ck"].iloc[0])
            return _score_span(pdf, ck * cr, (ck + 1) * cr)

        pairs = dup.groupBy("_blk", "_ck").applyInPandas(
            score_chunk, out_schema
        )
    return (
        pairs.orderBy(F.desc("cosine"), F.asc("id_a"), F.asc("id_b"))
        .limit(top_n)
    )


# Fixed-point quantization scale for LSH/IVF bucketing: embeddings are
# quantized to floor(x·10^6 + 0.5) int64 before projecting onto INTEGER
# hyperplanes/centroids. Integer dot products are associative and exact,
# so the bucket keys / probe order are bit-identical whether computed by
# a numpy matmul (Spark hot path), a Column fold, or the DuckDB oracle —
# float summation-order noise can never flip a sign bit. Exact cosine
# scoring still runs on the RAW floats; only candidate selection is
# quantized (error 1e-6 — irrelevant to recall).
QUANT = 1_000_000


def hyperplanes(dim: int, num_planes: int, seed: int = 7) -> list[list[int]]:
    """Deterministic integer hyperplanes: seeded unit normals scaled by
    1000 and rounded. Shared verbatim by the Spark plan and the DuckDB
    oracle generator (plans/similarity_queries.py)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return (
        (rng.standard_normal((num_planes, dim)) * 1000)
        .round()
        .astype(np.int64)
        .tolist()
    )


def quantize(vec_col: Column) -> Column:
    """floor(x·QUANT + 0.5) per element, as int64 — the cross-engine
    fixed-point form of an embedding."""
    return F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long"),
    )


def _bucket(vec_col: Column, planes: list[list[int]]) -> Column:
    """Sign-bit bucket key: bit h = 1 iff qvec · plane_h > 0 (integer).

    Column-expression form (small paths / cross-checks). Spark evaluates
    higher-order lambdas interpreted, so the hot path uses
    `_all_buckets_udf` (one numpy matmul per Arrow batch) instead —
    integer arithmetic guarantees both forms agree exactly."""
    qv = quantize(vec_col)
    key = F.lit(0).cast("long")
    for h, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                qv,
                F.array(*[F.lit(int(v)).cast("long") for v in plane]),
                lambda x, p: x * p,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        key = key + F.when(proj > 0, F.lit(2**h)).otherwise(F.lit(0))
    return key


def _all_buckets_udf(tables: list[list[list[int]]]):
    """Pandas UDF: embedding → array of per-table bucket keys, computed
    as ONE (batch × dim) @ (dim × H·L) int64 matmul + sign-bit packing.
    Arrow batches keep this vectorized end-to-end — the 100 TB-friendly
    form of the 32-projection fold — and the integer math makes the keys
    engine-independent (see QUANT)."""
    from pyspark.sql.functions import pandas_udf

    num_tables = len(tables)
    num_planes = len(tables[0])
    # (dim, L*H) integer plane matrix, fixed at plan time
    mat = np.concatenate(
        [np.asarray(t, dtype=np.int64).T for t in tables], axis=1
    )
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        qv = np.floor(v * QUANT + 0.5).astype(np.int64)
        proj = qv @ mat  # (n, L*H) int64 — exact
        bits = (proj > 0).reshape(len(qv), num_tables, num_planes)
        keys = (bits * weights).sum(axis=2)  # (n, L)
        return pd.Series(list(keys))

    return buckets


def _centroids_from_corpus(
    corpus: DataFrame, n_centroids: int, id_col: str, vec_col: str
):
    """Deterministic centroid set: an evenly-strided sample of corpus
    vectors by id rank, L2-normalized then quantized to int64 (×QUANT).

    The normalization runs on the DRIVER as a sequential Python fold —
    the same operation order as DuckDB's list_sum — so the quantized
    centroid coordinates are bit-identical to what the oracle SQL
    derives, and every downstream integer score matches exactly. (A
    k-means refinement would improve balance; strided seeding keeps the
    operator dependency-free and exactly reproducible — the coarse
    quantizer only gates recall/cost.)"""
    import math

    total = corpus.count()
    stride = max(1, total // n_centroids)
    rows = (
        corpus.select(id_col, vec_col)
        .filter(F.col(id_col) % stride == 0)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()  # only n_centroids vectors ever reach the driver
    )
    cents = []
    for r in rows:
        vec = [float(x) for x in r[1]]
        acc = 0.0
        for x in vec:  # sequential fold == DuckDB list_sum order
            acc += x * x
        nrm = math.sqrt(acc)
        cents.append([math.floor(x / nrm * QUANT + 0.5) for x in vec])
    return np.asarray(cents, dtype=np.int64)


def _nearest_centroids_udf(qcentroids: "np.ndarray", nprobe: int):
    """Pandas UDF: embedding → array of its `nprobe` nearest centroid
    ids. Score = integer dot of the quantized raw vector with the
    quantized NORMALIZED centroid — for a fixed vector this is monotone
    in cosine (the vector's own norm is constant across centroids), and
    integer arithmetic makes the probe order engine-exact. Ties break
    toward the lower centroid id (stable argsort ≡ ORDER BY s DESC, cid).
    One matmul per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    c = qcentroids.T  # (dim, k) int64

    @pandas_udf("array<int>")
    def nearest(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        qv = np.floor(v * QUANT + 0.5).astype(np.int64)
        sims = qv @ c  # (n, k) int64 — exact
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32") for row in order])

    return nearest


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 32,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) partitioning —
    the second canonical ANN scale path next to LSH.

    Corpus rows are assigned to their single nearest centroid (the
    inverted lists); queries probe their `nprobe` nearest centroids and
    exact-score only those lists. Expected scoring cost drops to
    ~nprobe/n_centroids of brute force. Same output schema as
    brute_force_topk; scores exact, candidate set approximate.
    """
    centroids = _centroids_from_corpus(corpus, n_centroids, id_col, vec_col)
    assign1 = _nearest_centroids_udf(centroids, 1)
    assignp = _nearest_centroids_udf(centroids, nprobe)
    c = with_norm(corpus, vec_col)
    lists = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    cand = (
        lists.join(F.broadcast(probes), "cell")
        .select("query_id", "neighbor_id")
        .distinct()
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    qv = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    cv = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")).alias(
                "cosine"
            ),
        )
    )
    return _topk_per_query(scored, k, route="single")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    seed: int = 7,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    ``num_tables`` independent hash tables of ``num_planes`` sign bits
    each (the classic L-tables construction): a corpus row lands in one
    bucket per table (L narrow projections, no shuffle); a query probes
    its bucket in every table — plus, with ``multiprobe``, each bucket
    at Hamming distance 1. A neighbor is a candidate if it collides in
    ANY table, so candidate recall is 1−(1−p^H)^L; with H=4, L=8 that's
    ≈0.67 even for middling cosine ≈0.3 neighbors, ≈1 for close ones.
    Candidates are deduped BEFORE exact cosine scoring, so each
    surviving pair is scored exactly once. Same output schema as
    brute_force_topk; scores are exact — only the candidate set is
    approximate.
    """
    tables = [
        hyperplanes(dim, num_planes, seed + t) for t in range(num_tables)
    ]
    c = with_norm(corpus, vec_col)
    buckets_udf = _all_buckets_udf(tables)
    # (neighbor_id, table, bucket) ONLY through the explode + bucket
    # join: the 64-dim payload must not be duplicated x num_tables;
    # vectors are joined back after candidate dedup. Bucket keys come
    # from one vectorized matmul per Arrow batch.
    cb = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.posexplode(buckets_udf(F.col(vec_col))).alias("t", "b"),
        )
    )
    # query probes: own bucket per table (+ all Hamming-1 buckets with
    # multiprobe), built from the same bucket array
    probe = F.array(
        F.col("_b"),
        *(
            [F.col("_b").bitwiseXOR(F.lit(1 << h)) for h in range(num_planes)]
            if multiprobe
            else []
        ),
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.posexplode(buckets_udf(F.col(vec_col))).alias("t", "_b"),
        )
        .select("query_id", "t", F.explode(probe).alias("b"))
    )
    # candidate ids deduped across tables/probes BEFORE scoring
    cand = (
        cb.join(F.broadcast(q), ["t", "b"])
        .select("query_id", "neighbor_id")
        .distinct()
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    qn = with_norm(queries, vec_col)
    qv = qn.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    cv = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")).alias(
                "cosine"
            ),
        )
    )
    return _topk_per_query(scored, k)


# -- int8 scalar quantization (SQ8) ----------------------------------------
def sq8_train(
    corpus: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension [min, max] over the corpus — the SQ8 codebook.
    64 doubles per side: metadata-scale, collected driver-side exactly
    like IVF centroids. One posexplode + 64-group aggregate."""
    dims = (
        corpus.select(F.posexplode(vec_col).alias("d", "x"))
        .select("d", F.col("x").cast("double").alias("x"))
        .groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("d")
        .collect()
    )
    return [r["mn"] for r in dims], [r["mx"] for r in dims]


def sq8_codes_udf(mins: list[float], maxs: list[float]):
    """float vector → int8 codes (as ints), vectorized: ONE numpy pass
    per Arrow batch. code_d = clip(floor((x_d − mn_d)·255/(mx_d − mn_d)
    + 0.5), 0, 255); constant dims → 0. Every op is an IEEE
    correctly-rounded primitive evaluated in a fixed order, so the
    codes are bit-identical to the SQL expression form the q96 oracle
    uses."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mn = np.asarray(mins, dtype=np.float64)
    rng = np.asarray(maxs, dtype=np.float64) - mn
    safe = np.where(rng == 0.0, 1.0, rng)

    @pandas_udf("array<int>")
    def f(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            x = np.asarray(v, dtype=np.float64)
            c = np.clip(np.floor((x - mn) * 255.0 / safe + 0.5), 0, 255)
            c = np.where(rng == 0.0, 0.0, c)
            out.append(c.astype(np.int32).tolist())
        return pd.Series(out)

    return f


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN with an int8 scalar-quantized index + exact re-rank — the
    memory-compressed scale path: codes are 4x smaller than float32
    (64 bytes/vector here), the candidate metric is an INTEGER
    sum-of-squared-code-differences (exact, engine-portable, SIMD-able
    at scale), and only the top-`rerank` candidates per query pay the
    exact float cosine.

    Recall loss comes only from quantization distorting the metric
    inside the rerank boundary; tests pin recall vs brute force.
    Output: (query_id, neighbor_id, cosine, rank) — rank ≤ k by exact
    cosine over the candidate set."""
    from .topk import grouped_topk

    mins, maxs = sq8_train(corpus, vec_col)
    codes = sq8_codes_udf(mins, maxs)
    cc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        codes(F.col(vec_col)).alias("_cc"),
    )
    qc = queries.select(
        F.col(id_col).alias("query_id"),
        codes(F.col(vec_col)).alias("_qc"),
    )
    d2 = F.aggregate(
        F.zip_with("_qc", "_cc", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(qc)
        .crossJoin(cc)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", d2.alias("_d2"))
    )
    cand = grouped_topk(
        scored, ["query_id"], [F.col("_d2"), F.col("neighbor_id")], rerank
    ).select("query_id", "neighbor_id")
    qn = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    cn = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    rer = (
        cand.join(F.broadcast(qn), "query_id")
        .join(cn, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ).alias("cosine"),
        )
    )
    return _topk_per_query(rer, k, route="single")


def centroid_rollup(
    corpus: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Per-group vector mean — the centroid-maintenance primitive
    behind IVF retraining and SemDeDup cluster upkeep. One posexplode
    → ONE (group, dim) shuffle of scalar keys → per-dim exact decimal
    mean (order-independent, engine-portable), quantized to `scale`
    dp, reassembled into an array ordered by dimension.

    Scale: the shuffle carries (group, dim, value) triples — groups x
    dims cells on the reduce side, independent of corpus row count
    after the map-side partial aggregation. No vector ever crosses the
    wire whole.

    Returns (group_col, n_vectors, centroid: array<double>)."""
    q = 10 ** scale
    ex = corpus.select(
        F.col(group_col), F.posexplode(vec_col).alias("d", "x")
    ).select(group_col, "d", F.col("x").cast("double").alias("x"))
    per_dim = ex.groupBy(group_col, "d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,12)")).alias("s"),
    )
    mean_q = (
        F.floor(
            F.col("s").cast("double") / F.col("n") * q + F.lit(0.5)
        )
        / q
    )
    return (
        per_dim.select(group_col, "d", F.col("n").alias("n"), mean_q.alias("m"))
        .groupBy(group_col)
        .agg(
            F.max("n").alias("n_vectors"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("d"), F.col("m")))
                ),
                lambda s: s["m"],
            ).alias("centroid"),
        )
    )
