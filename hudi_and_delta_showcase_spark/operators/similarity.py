"""Similarity search over embedding columns (SURVEY.md §2.12):
brute-force cosine top-k as the exact baseline, random-hyperplane LSH
bucketing as the scale path.

All vector math is JVM-side array expressions (``zip_with`` +
``aggregate`` folds) — Arrow/pandas never enters the hot path.

Scale notes (100 TB / billions of vectors): brute force is
O(|queries| x |corpus|) with the query side broadcast — correct tool for
small query batches. The LSH path buckets the corpus once (linear scan,
one shuffle on bucket key), then probes only matching buckets; recall is
tuned by (n_planes, n_tables). An IVF variant would replace the random
planes with k-means centroids — same join shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


#: Default ceiling on the query side of broadcast/collected ANN paths.
#: 1e5 x 768-dim float64 ≈ 600 MB broadcast — already at the edge of
#: sane; a caller with more queries must CHUNK them (run the operator
#: per chunk and union), not raise the cap blindly.
MAX_QUERY_SIDE = 100_000


def _bound_query_side(
    q: DataFrame, max_queries: int | None, op: str
) -> DataFrame:
    """Enforce the documented small-query-side contract INSIDE the plan
    — a window count over the query side feeds ``assert_true``, so a
    caller handing 10⁸ queries fails fast with a clear message instead
    of OOMing the driver/executors through a broadcast. No extra Spark
    job; the single-partition exchange touches only the (by contract
    small) query side."""
    if max_queries is None:
        return q
    msg = (
        f"{op}: query side exceeds max_queries={max_queries}; chunk the "
        "query set (run per chunk and union results), or raise "
        "max_queries explicitly if memory allows"
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
    return (
        q.withColumn("__qn", n)
        .where(
            F.coalesce(
                F.assert_true(F.col("__qn") <= F.lit(max_queries), F.lit(msg)),
                F.lit(True),
            )
        )
        .drop("__qn")
    )


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def with_cosine(
    df: DataFrame, a_col: str, b_col: str, out: str = "cosine"
) -> DataFrame:
    """Cosine similarity between two array<float/double> columns, folded
    left-to-right in double precision. Built as SQL-parsed ``F.expr``:
    the parsed form of the identical fold measured ~13% faster than the
    Column-API construction (same exact arithmetic, same results)."""
    a = f"cast(`{a_col}` as array<double>)"
    b = f"cast(`{b_col}` as array<double>)"
    zero = "cast(0.0 as double)"
    expr = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), {zero},"
        " (acc, x) -> acc + x)"
        f" / (sqrt(aggregate({a}, {zero}, (acc, x) -> acc + x * x))"
        f" * sqrt(aggregate({b}, {zero}, (acc, x) -> acc + x * x)))"
    )
    return df.withColumn(out, F.expr(expr))


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    round_digits: int | None = 6,
    max_queries: int | None = MAX_QUERY_SIDE,
) -> DataFrame:
    """Exact top-k neighbors for each query vector: broadcast the (small)
    query set against the corpus, window-rank per query. The broadcast
    is capped at ``max_queries`` (in-plan assert; see
    ``_bound_query_side``) — chunk larger query sets.

    ``round_digits`` quantizes the similarity before ranking so the
    ordering is reproducible across engines/summation orders; ties break
    on neighbor id."""
    q = _bound_query_side(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ),
        max_queries,
        "topk_bruteforce",
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .transform(lambda d: with_cosine(d, "q_vec", "c_vec", "cosine"))
    )
    sim = (
        F.round(F.col("cosine"), round_digits)
        if round_digits is not None
        else F.col("cosine")
    )
    scored = scored.withColumn("sim", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    out: str = "bucket",
    multiprobe: int = 0,
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of ``n_planes`` projections
    forms the bucket id; ``n_tables`` independent tables boost recall.
    Emits one row per (row, table). Planes are seeded/deterministic and
    inlined as literal arrays (broadcast-by-literal — no join).

    ``multiprobe=1`` additionally emits every bucket at Hamming
    distance 1 (each single sign bit flipped) — the standard multiprobe
    trick: probe side fans out ~(1+n_planes)x while the corpus side
    keeps one small bucket per table, so recall rises without growing
    corpus-side buckets. Use on the (small) query side only."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables, n_planes, dim)
    # Stage 1: all (table, plane) projections in ONE numpy matmul per
    # Arrow batch — a vectorized pandas_udf. Array-expression dot folds
    # (zip_with+aggregate) are interpreted per element and ~50x slower
    # for planes-many dots per row; a (batch x dim) @ (dim x T*P) matmul
    # is the scale path for bulk projections.
    flat = planes.reshape(n_tables * n_planes, dim).T.astype("float64")
    weights = (1 << np.arange(n_planes)).astype("int64")

    @F.pandas_udf("array<long>")
    def _buckets(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy()).astype("float64")
        bits = (mat @ flat) >= 0
        ids = (bits.reshape(len(mat), n_tables, n_planes) * weights).sum(axis=2)
        return pd.Series(list(ids))

    staged = df.withColumn("__bks", _buckets(F.col(vec_col)))
    # Stage 2: probes are cheap bit flips over the materialized buckets.
    probes = []
    for t in range(n_tables):
        bc = F.element_at(F.col("__bks"), t + 1)
        probes.append(F.struct(F.lit(t).alias("table"), bc.alias(out)))
        if multiprobe >= 1:
            for p in range(n_planes):
                probes.append(
                    F.struct(
                        F.lit(t).alias("table"),
                        bc.bitwiseXOR(F.lit(1 << p)).alias(out),
                    )
                )
    return (
        staged.withColumn("__b", F.explode(F.array(*probes)))
        .select("*", "__b.table", f"__b.{out}")
        .drop("__b", "__bks")
    )


def _spherical_kmeans(mat: "np.ndarray", k: int, iters: int, seed: int) -> "np.ndarray":
    """Deterministic spherical k-means (cosine) on a sample matrix.
    Returns L2-normalized centroids (k x dim)."""
    rng = np.random.RandomState(seed)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    cents = norm[rng.choice(len(norm), size=k, replace=False)].copy()
    for _ in range(iters):
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(norm @ cents.T, axis=1)
        for j in range(k):
            members = norm[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: "np.ndarray",
    nprobe: int = 1,
    out: str = "cell",
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids (cosine) —
    one numpy matmul per Arrow batch; centroids ride in the UDF closure
    (broadcast once per executor). nprobe=1 for the corpus side (each
    vector lives in ONE inverted list), >1 on the query side to widen
    the search."""
    cent = centroids.astype("float64")

    @F.pandas_udf("array<int>")
    def _cells(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy()).astype("float64")
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cent.T
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype("int32")))

    return df.withColumn(out, F.explode(_cells(F.col(vec_col))))


def topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
    max_queries: int | None = MAX_QUERY_SIDE,
) -> DataFrame:
    """IVF ANN: spherical-kmeans coarse quantizer -> inverted lists keyed
    by centroid id -> probe the ``nprobe`` closest lists per query ->
    exact cosine re-rank. The centroid model is trained on a bounded
    driver-side sample (standard IVF practice — training is O(sample),
    not O(corpus)), then shipped to executors in the UDF closure.

    Scale notes (billions of vectors): corpus assignment is one linear
    map-only pass; the candidate join shuffles on (cell) with list sizes
    ~|corpus|/n_centroids — raise n_centroids to keep lists bounded, and
    re-shard hot cells like any skewed key. Versus LSH: data-adaptive
    cells give better recall/candidate on clustered embeddings."""
    sample = np.vstack(
        [r[0] for r in corpus.select(vec_col).limit(train_sample).collect()]
    ).astype("float64")
    cents = _spherical_kmeans(sample, n_centroids, iters, seed)

    cb = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec", cents, nprobe=1,
    )
    qb = ivf_assign(
        _bound_query_side(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
            ),
            max_queries,
            "topk_ivf",
        ),
        "q_vec", cents, nprobe=nprobe,
    )
    cand = (
        cb.join(F.broadcast(qb), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
    )
    scored = with_cosine(cand, "q_vec", "c_vec", "cosine").withColumn(
        "sim", F.round("cosine", 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def quantize_vec(vec_col: str, scale: int = 1000) -> F.Column:
    """Quantize an embedding to int64 (floor(x*scale + 0.5)) — dots over
    quantized vectors are exact integers (< 2^53), so cosine values are
    bit-identical across engines and summation orders."""
    return F.expr(
        f"transform(cast({vec_col} as array<double>), "
        f"x -> cast(floor(x * {scale} + 0.5) as bigint))"
    )


def exact_topk_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 1,
    scale: int = 1000,
    max_queries: int | None = MAX_QUERY_SIDE,
) -> DataFrame:
    """Exact top-k neighbors under the QUANTIZED cosine (the
    deterministic ground-truth metric used to audit ANN indexes):
    broadcast the query set (capped at ``max_queries``), integer dot
    folds, round(.,6) + id tie-break. Output: (query_id, neighbor_id,
    sim, rank)."""
    q = _bound_query_side(
        queries.select(
            F.col(id_col).alias("query_id"),
            quantize_vec(vec_col).alias("q_q"),
        ),
        max_queries,
        "exact_topk_quantized",
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize_vec(vec_col).alias("c_q")
    )
    zero = F.lit(0).cast("long")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), zero, lambda acc, x: acc + x
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.round(
                dot(F.col("q_q"), F.col("c_q"))
                / (
                    F.sqrt(dot(F.col("q_q"), F.col("q_q")))
                    * F.sqrt(dot(F.col("c_q"), F.col("c_q")))
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def embedding_near_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks: the dedup
    variant of similarity search. Blocking (here on ``block_col``, e.g. a
    cluster/label/LSH-bucket id) turns the O(n^2) all-pairs problem into
    sum(|block|^2) — the join shuffles once on the block key and each
    block is scored with ONE vectorized integer matmul in applyInPandas.

    Determinism contract: embeddings are quantized to ints
    (floor(x*scale + 0.5)) so dot products are EXACT in int64 and every
    partial sum < 2^53 stays exact in double — identical results in any
    engine and any summation order (cross-engine-checkable, unlike raw
    float dots whose value depends on accumulation order).

    Scale notes (billions of vectors): blocks must be bounded (re-block
    giant clusters by a secondary hash); for global near-dup detection
    use LSH buckets as blocks and union over tables."""

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
        q = np.floor(mat * scale + 0.5).astype("int64")
        gram = q @ q.T
        norms = np.sqrt(np.diag(gram).astype("float64"))
        sim = gram / np.outer(norms, norms)
        iu = np.triu_indices(len(pdf), 1)
        ids = pdf[id_col].to_numpy()
        a, b = ids[iu[0]], ids[iu[1]]
        s = np.round(sim[iu], 6)
        keep = s >= threshold
        return pd.DataFrame(
            {
                "doc_a": np.minimum(a, b)[keep],
                "doc_b": np.maximum(a, b)[keep],
                "cosine": s[keep],
            }
        )

    return df.groupBy(block_col).applyInPandas(
        per_block, "doc_a long, doc_b long, cosine double"
    )


def topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
    max_queries: int | None = MAX_QUERY_SIDE,
) -> DataFrame:
    """ANN top-k: bucket corpus and queries with the same hyperplanes,
    join on (table, bucket), exact-rank the candidates. Recall < 1.0 by
    design; tested against the brute-force baseline.

    Corpus side is bucketed single-probe (buckets stay ~|corpus|/2^planes);
    the query side multiprobes Hamming-1 buckets, so candidate volume per
    query is ~(1+planes) * tables * bucket_size — independent of corpus
    skew and never a cross join. The bucketed query side is BROADCAST —
    capped at ``max_queries`` input rows (in-plan assert); chunk larger
    query sets."""
    cb = hyperplane_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec", dim, n_planes, n_tables, seed,
    )
    qb = hyperplane_buckets(
        _bound_query_side(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
            ),
            max_queries,
            "topk_lsh",
        ),
        "q_vec", dim, n_planes, n_tables, seed, multiprobe=multiprobe,
    )
    cand = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
    )
    # Score BEFORE deduping multitable/multiprobe hits: the cosine is
    # map-side (the join is broadcast, rows never moved yet), so the
    # only shuffle in the whole operator carries skinny
    # (ids, sim) rows instead of both embedding vectors — ~50x less
    # shuffle volume for a ~1.2x duplicate-scoring overhead (r7;
    # deduping first would shuffle 2x dim doubles per candidate).
    scored = (
        with_cosine(cand, "q_vec", "c_vec", "cosine")
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# --------------------------------------------------------------------- #
# Product quantization (PQ): compressed-domain ANN
# --------------------------------------------------------------------- #


def _kmeans_l2(mat: "np.ndarray", k: int, iters: int, seed: int) -> "np.ndarray":
    """Deterministic Lloyd k-means (L2) for PQ sub-codebooks."""
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(k):
            members = mat[assign == j]
            if len(members):
                cents[j] = members.mean(0)
    return cents


def pq_train(
    corpus: DataFrame,
    vec_col: str,
    m: int = 8,
    ncode: int = 16,
    train_sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
) -> "np.ndarray":
    """Train PQ codebooks: split the vector into ``m`` subspaces, run
    k-means with ``ncode`` centroids in each. Driver-side on a bounded
    sample (O(sample), standard PQ practice). Returns (m, ncode, dsub)."""
    sample = np.vstack(
        [r[0] for r in corpus.select(vec_col).limit(train_sample).collect()]
    ).astype("float64")
    dsub = sample.shape[1] // m
    assert sample.shape[1] % m == 0, "dim must divide into m subspaces"
    return np.stack(
        [
            _kmeans_l2(
                sample[:, j * dsub : (j + 1) * dsub], ncode, iters, seed + j
            )
            for j in range(m)
        ]
    )


def pq_encode(
    df: DataFrame, vec_col: str, codebooks: "np.ndarray", out: str = "codes"
) -> DataFrame:
    """Encode each vector as ``m`` sub-codebook indices — the 32x
    compression that lets a 100 TB corpus's index live in memory
    (64 floats -> 8 bytes here). One numpy pass per Arrow batch."""
    cb = codebooks.astype("float64")
    m, ncode, dsub = cb.shape

    @F.pandas_udf("array<int>")
    def _enc(vs: pd.Series) -> pd.Series:
        mat = np.vstack(vs.to_numpy()).astype("float64")
        codes = np.empty((len(mat), m), dtype="int32")
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            d = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(-1)
            codes[:, j] = d.argmin(1)
        return pd.Series(list(codes))

    return df.withColumn(out, _enc(F.col(vec_col)))


def pq_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_candidates: int = 50,
    m: int = 8,
    ncode: int = 16,
    train_sample: int = 2048,
    seed: int = 42,
    max_queries: int | None = MAX_QUERY_SIDE,
) -> DataFrame:
    """PQ asymmetric-distance candidate generation: corpus rides as
    8-byte codes; each query builds an (m x ncode) lookup table of
    sub-dot-products, and the approximate dot of query x corpus item is
    m LUT adds instead of d multiplies (compressed-domain scan — the
    PQ speedup is bandwidth, not candidate pruning). Approximate cosine
    uses the reconstruction norm (|x̂|² = Σ_j |x̂_j|², exact for the
    concatenated reconstruction). Emits the top ``n_candidates`` per
    query for exact re-ranking.

    Scale shape: queries (small) broadcast in the closure; ONE
    mapInPandas pass over the coded corpus computes per-batch partial
    top-C via numpy argpartition, then a window merges partials —
    never an uncompressed all-pairs materialization."""
    cb = pq_train(corpus, vec_col, m, ncode, train_sample, seed=seed)
    coded = pq_encode(
        corpus.select(F.col(id_col).alias("neighbor_id"), vec_col),
        vec_col,
        cb,
    ).select("neighbor_id", "codes")

    # bounded collect: fetch at most max_queries+1 rows so an oversized
    # query set fails loudly here instead of OOMing the driver — the
    # LUT below is O(|queries| * m * ncode) driver memory by design.
    fetch = (
        queries.select(id_col, vec_col).limit(max_queries + 1)
        if max_queries is not None
        else queries.select(id_col, vec_col)
    )
    qrows = fetch.collect()
    if max_queries is not None and len(qrows) > max_queries:
        raise ValueError(
            f"pq_candidates: query side exceeds max_queries={max_queries}; "
            "chunk the query set (run per chunk and union results), or "
            "raise max_queries explicitly if memory allows"
        )
    qids = np.array([r[0] for r in qrows])
    qmat = np.vstack([r[1] for r in qrows]).astype("float64")
    qnorm = np.maximum(np.linalg.norm(qmat, axis=1), 1e-12)
    mm, ncode_, dsub = cb.shape
    # LUT[q, j, c] = <q_sub_j, cb[j][c]>
    lut = np.einsum(
        "qjd,jcd->qjc", qmat.reshape(len(qmat), mm, dsub), cb
    )
    cnorm2 = (cb**2).sum(-1)  # (m, ncode): |x̂_j|² per code

    def _scan(batches):
        for pdf in batches:
            codes = np.vstack(pdf["codes"].to_numpy())  # (n, m)
            n = len(codes)
            j_idx = np.arange(mm)
            # approx dot: (nq, n) — gather LUT at each item's codes
            adot = lut[:, j_idx[None, :], codes].sum(-1)
            rnorm = np.sqrt(cnorm2[j_idx[None, :], codes].sum(-1))
            sim = adot / (qnorm[:, None] * np.maximum(rnorm, 1e-12)[None, :])
            take = min(n_candidates, n)
            top = np.argpartition(-sim, take - 1, axis=1)[:, :take]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, take),
                    "neighbor_id": pdf["neighbor_id"].to_numpy()[
                        top
                    ].ravel(),
                    "approx_sim": np.take_along_axis(sim, top, 1).ravel(),
                }
            )
            yield out[out["query_id"] != out["neighbor_id"]]

    parts = coded.mapInPandas(
        _scan,
        "query_id long, neighbor_id long, approx_sim double",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_sim"), F.asc("neighbor_id")
    )
    return (
        parts.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_candidates)
        .select("query_id", "neighbor_id")
    )


def topk_pq(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_candidates: int = 100,
    m: int = 8,
    ncode: int = 16,
    seed: int = 42,
    max_queries: int | None = MAX_QUERY_SIDE,
) -> DataFrame:
    """PQ ANN top-k: compressed-domain candidate scan (pq_candidates)
    followed by exact-cosine re-rank of ONLY the candidate set — the
    standard two-stage PQ retrieval. Re-rank cost is O(|Q| x C), never
    O(|Q| x corpus). Query side capped at ``max_queries`` (enforced in
    pq_candidates' bounded collect)."""
    cand = pq_candidates(
        queries, corpus, id_col, vec_col,
        n_candidates=n_candidates, m=m, ncode=ncode, seed=seed,
        max_queries=max_queries,
    )
    pairs = cand.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        "neighbor_id",
    ).join(
        F.broadcast(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
            )
        ),
        "query_id",
    )
    scored = with_cosine(pairs, "q_vec", "c_vec", "cosine").withColumn(
        "sim", F.round("cosine", 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_clusters: int = 8,
    nprobe: int = 2,
    train_sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup-style semantic deduplication: spherical-kmeans cluster
    the embedding space, find near-duplicate pairs WITHIN clusters
    (cosine >= threshold over integer-quantized vectors), and keep the
    lowest-id representative of every duplicate pair. Returns
    ``(kept, pairs)``.

    This is by construction cluster-scoped — a near-dup pair split
    across clusters survives, which is the accepted SemDeDup trade-off
    (recall is bought with ``nprobe`` multi-assignment, paid as extra
    candidate volume). Use ``embedding_near_pairs`` blocked on a TRUE
    grouping column when exactness is required.

    Scale shape: training is a bounded driver-side sample (O(sample),
    not O(corpus)); assignment is one map-only Arrow pass; the pair scan
    shuffles once on the cluster id and runs one integer matmul per
    cluster block (bounded by |corpus|/n_clusters x nprobe — raise
    ``n_clusters`` with corpus size, re-shard hot cells like any skewed
    key). Never all-pairs."""
    sample = np.vstack(
        [r[0] for r in df.select(vec_col).limit(train_sample).collect()]
    ).astype("float64")
    cents = _spherical_kmeans(
        sample, min(n_clusters, len(sample)), iters, seed
    )
    assigned = ivf_assign(
        df.select(F.col(id_col), F.col(vec_col)),
        vec_col,
        cents,
        nprobe=nprobe,
    )
    pairs = embedding_near_pairs(
        assigned, id_col, vec_col, threshold, "cell"
    ).dropDuplicates(["doc_a", "doc_b"])  # multi-probe finds pairs twice
    drop = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    kept = df.join(drop, id_col, "left_anti")
    return kept, pairs


# ---------------------------------------------------------------------------
# incremental persisted IVF index (the vector-DB ingest path, r7)
# ---------------------------------------------------------------------------


def create_ivf_index(
    spark,
    path: str,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    train_sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
):
    """Build a PERSISTED IVF index as a lakehouse table — the ANN
    sibling of ``dedup.create_lsh_index``: a continuously-ingesting
    vector corpus must not re-train/re-assign per batch.

    The coarse quantizer trains ONCE on a bounded sample (standard IVF
    practice: O(sample), never O(corpus)) and freezes into
    ``_ivf_model.json`` beside the table — every later upsert and
    query assigns against the SAME centroids, so cell ids stay
    comparable across the index's lifetime (re-training would orphan
    every stored assignment; rebuild the index to re-center). Rows are
    ``(id, vec, cell)`` keyed on id — re-ingesting a vector replaces
    its previous version even when its cell changed (MoR latest-per-key
    merge). MERGE-ON-READ because ingest batches spread across cells:
    a CoW upsert would rewrite most inverted lists every batch, the
    MoR log append costs O(batch) (same economics as the LSH band
    index). ``optimize(cluster_by=['cell'])`` lays version 0 out as
    real inverted lists — disjoint cell ranges per file — so a probe
    reads O(matching lists) through ``read_where``'s stats pruning."""
    import json as _json

    from hudi_and_delta_showcase_spark.tables import LakehouseTable, fsio

    sample = np.vstack(
        [r[0] for r in corpus.select(vec_col).limit(train_sample).collect()]
    ).astype("float64")
    cents = _spherical_kmeans(sample, n_centroids, iters, seed)
    assigned = ivf_assign(
        corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        ),
        "vec", cents, nprobe=1,
    )
    t = LakehouseTable.create(
        spark, path, assigned, key_cols=["id"], table_type="mor"
    )
    t.optimize(target_files=max(4, n_centroids // 4), cluster_by=["cell"])
    fsio.write_atomic(
        fsio.join(path, "_ivf_model.json"),
        _json.dumps(
            {
                "centroids": cents.tolist(),
                "n_centroids": n_centroids,
                "id_col": id_col,
                "vec_col": vec_col,
            }
        ),
    )
    return t


def _ivf_model(index) -> "np.ndarray":
    import json as _json

    from hudi_and_delta_showcase_spark.tables import fsio

    doc = _json.loads(
        fsio.read_text(fsio.join(index.path, "_ivf_model.json"))
    )
    return np.asarray(doc["centroids"], dtype="float64")


def ivf_index_upsert(index, batch: DataFrame, id_col: str, vec_col: str):
    """Ingest a batch into the persisted index: assign against the
    FROZEN centroids (one map-only pass) and MoR-upsert — O(batch) log
    append, no inverted list rewritten; periodic ``compact()`` +
    ``optimize(cluster_by=['cell'])`` restore tight lists."""
    cents = _ivf_model(index)
    return index.upsert(
        ivf_assign(
            batch.select(
                F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
            ),
            "vec", cents, nprobe=1,
        )
    )


def ivf_index_topk(
    index,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
    max_queries: int | None = MAX_QUERY_SIDE,
) -> DataFrame:
    """Probe the persisted index: queries assign to their ``nprobe``
    nearest cells, each probed cell becomes ONE stats-pruned list read
    (``read_where`` on the clustered ``cell`` column — O(matching
    files) after optimize, with MoR logs merged in), candidates join
    on cell and re-rank by exact cosine. The probed-cell set is
    nprobe x |queries| distinct ints — driver-side metadata scale."""
    from functools import reduce

    cents = _ivf_model(index)
    qb = ivf_assign(
        _bound_query_side(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
            ),
            max_queries,
            "ivf_index_topk",
        ),
        "q_vec", cents, nprobe=nprobe,
    )
    cells = sorted(r.cell for r in qb.select("cell").distinct().collect())
    lists = reduce(
        lambda a, b: a.unionByName(b),
        [
            index.read_where("cell", lo=c, hi=c).select(
                F.col("id").alias("neighbor_id"),
                F.col("vec").alias("c_vec"),
                "cell",
            )
            for c in cells
        ],
    )
    cand = (
        lists.join(F.broadcast(qb), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
    )
    scored = with_cosine(cand, "q_vec", "c_vec", "cosine").withColumn(
        "sim", F.round("cosine", 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
