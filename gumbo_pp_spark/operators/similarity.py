"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-
hyperplane LSH bucketed variant as the 100 TB scale path (bucket join
instead of cross join).  All dot products run JVM-side via
``zip_with``/``aggregate`` higher-order functions — no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, v) -> acc + v)"
)
NORM_EXPR = "sqrt(aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("norm", F.expr(NORM_EXPR.format(a=vec_col)))


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    The query set is broadcast (small dim table pattern) so the big
    side is never shuffled FOR THE JOIN; the only wide exchange is the
    final per-query top-k, which is a partial top-k per partition
    under AQE.  (An unsplittable under-parallel input is first spread
    across cores — see ``ensure_min_parallelism``; a no-op at corpus
    scale.)  Returns (query_id, neighbor_id, rank).
    """
    from pyspark.sql.window import Window

    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    base = with_norm(ensure_min_parallelism(df), vec_col).where(F.col("norm") > 0)
    q = (
        with_norm(queries, vec_col)
        .where(F.col("norm") > 0)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("norm").alias("q_norm"),
        )
    )
    dot = DOT_EXPR.format(a=vec_col, b="q_vec")
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", F.expr(dot) / (F.col("norm") * F.col("q_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col(id_col).cast("bigint").alias("neighbor_id"),
            F.col("rank").cast("bigint"),
        )
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cos_e6) with
    a < b and cosine ≥ threshold.

    Candidates are blocked by the REAL scale path (round 3; previously
    a documented modulus stand-in): the deterministic hyperplane-LSH
    bucket (:func:`hyperplane_sketch_expr`, plan-time literal signs)
    with hamming-1 MULTI-PROBE on the smaller-id side — each pair is
    examined when the two buckets differ in at most one plane, so the
    join key is a bucket id, never a cross join, and a's probe buckets
    are distinct so no pair is emitted twice.  Survivors are scored
    with a JVM-side dot product; cosine is e6-scaled so the DuckDB
    oracle (which recomputes the identical buckets/probes) compares
    exactly."""
    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    sk = hyperplane_sketch_expr(dim, n_planes, vec_col)
    base = with_norm(ensure_min_parallelism(df), vec_col).where(F.col("norm") > 0).withColumn(
        "bucket", F.expr(sk)
    )
    probes = ", ".join(f"bucket ^ {2 ** p}" for p in range(n_planes))
    a = base.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
        F.explode(F.expr(f"array(bucket, {probes})")).alias("block"),
    )
    b = base.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"), F.col("bucket").alias("block"),
    )
    dot = DOT_EXPR.format(a="va", b="vb")
    return (
        a.join(b, ["block"])
        .where(F.col("a") < F.col("b"))
        .withColumn("cos", F.expr(dot) / (F.col("na") * F.col("nb")))
        .where(F.col("cos") >= threshold)
        .select(
            F.col("a").cast("bigint"),
            F.col("b").cast("bigint"),
            F.round(F.col("cos") * 1e6).cast("bigint").alias("cos_e6"),
        )
    )


def plane_signs(p: int, dim: int) -> list[float]:
    """Deterministic ±1 weights of hyperplane ``p``: sign = parity of
    the first hex digit of md5('<p>|<i>') — computed ONCE here at plan
    time, never at runtime (the round-1 version evaluated 256 md5 calls
    per row; the signs are constants and belong in the plan)."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"{p}|{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
        for i in range(dim)
    ]


def hyperplane_sketch_expr(dim: int, n_planes: int, vec_col: str = "embedding") -> str:
    """Random-hyperplane LSH sketch as pure SQL: the ±1 sign matrix is
    emitted as array literals, so the per-row work is one zip_with dot
    product per plane (JVM-side, no hashing).  Returns an int bucket in
    [0, 2^n_planes)."""
    bits = []
    for p in range(n_planes):
        lits = ", ".join(f"{s}D" for s in plane_signs(p, dim))
        dot = (
            f"aggregate(zip_with({vec_col}, array({lits}), "
            "(x, s) -> CAST(x AS DOUBLE) * s), 0D, (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN ({dot}) > 0 THEN {2 ** p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def lsh_cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate variant: candidates restricted to the query's LSH
    bucket (equi-join on bucket → co-partitioned shuffle instead of a
    cross join).  At 100 TB the bucket column is what you bucket/
    cluster the table by, making the probe side a bucket-pruned scan.

    ``multiprobe`` additionally probes every bucket at hamming
    distance 1 from the query's bucket (flip each of the ``n_planes``
    bits) — the standard multi-probe LSH recall boost that costs
    ``n_planes`` extra probe rows per query instead of more tables.
    """
    from pyspark.sql.window import Window

    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    sk = hyperplane_sketch_expr(dim, n_planes, vec_col)
    base = (
        with_norm(ensure_min_parallelism(df), vec_col)
        .where(F.col("norm") > 0)
        .withColumn("bucket", F.expr(sk))
    )
    q = (
        with_norm(queries, vec_col)
        .where(F.col("norm") > 0)
        .withColumn("bucket", F.expr(sk))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("norm").alias("q_norm"),
            "bucket",
        )
    )
    if multiprobe:
        probes = ", ".join(f"bucket ^ {2 ** p}" for p in range(n_planes))
        q = q.withColumn("bucket", F.explode(F.expr(f"array(bucket, {probes})")))
    dot = DOT_EXPR.format(a=vec_col, b="q_vec")
    scored = (
        base.join(F.broadcast(q), "bucket")
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", F.expr(dot) / (F.col("norm") * F.col("q_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col(id_col).cast("bigint").alias("neighbor_id"),
            F.col("rank").cast("bigint"),
        )
    )


def lsh_recall_vs_exact(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Measured recall@k of the LSH path against the exact baseline —
    one row (n_queries, n_exact, n_hit, recall_e4).  This is the
    metric that gates an ANN rollout at scale; both sides are
    deterministic so the oracle recomputes it bit-for-bit."""
    exact = cosine_topk(df, queries, k=k, vec_col=vec_col, id_col=id_col)
    approx = lsh_cosine_topk(
        df, queries, k=k, dim=dim, n_planes=n_planes, vec_col=vec_col, id_col=id_col
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    return (
        exact.agg(
            F.countDistinct("query_id").alias("nq"),
            F.count(F.lit(1)).alias("n_exact"),
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            F.col("nq").cast("bigint").alias("n_queries"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.round(F.col("n_hit") * 10000.0 / F.col("n_exact")).cast("bigint").alias("recall_e4"),
        )
    )


# ----------------------------------------------------------------------
# IVF-Flat scale path.  The coarse quantizer is a deterministic sample
# of the corpus itself (every ``pivot_mod``-th vector) instead of
# trained k-means centroids — the training step is a separate offline
# fit at scale, while the QUERY path (assign → nprobe probe-lists →
# in-list exact scoring) is exactly IVF-Flat and fully deterministic,
# so the DuckDB oracle recomputes it bit-for-bit.  Scale shape: the
# pivot table is tiny and broadcast twice (assignment + probe); base
# assignment is a broadcast nested-loop over K pivots whose groupBy
# key (vec_id) is already co-located, so map-side combine collapses
# the K candidate rows to one before the exchange; the search join is
# an equi-join on pivot_id — at 100 TB pivot_id is the table's
# bucketing/cluster column and the probe becomes a bucket-pruned scan.


def _pivot_side(pivots: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Normalized pivot projection shared by assignment and probe
    sides — one definition so their filtering/norm semantics cannot
    diverge."""
    return with_norm(pivots, vec_col).where(F.col("norm") > 0).select(
        F.col(id_col).alias("pivot_id"),
        F.col(vec_col).alias("p_vec"),
        F.col("norm").alias("p_norm"),
    )


def ivf_assignments(
    df: DataFrame,
    pivots: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every vector to its nearest pivot by cosine (ties break
    to the smallest pivot_id).  Returns (id, vec, norm, pivot_id)."""
    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    base = with_norm(ensure_min_parallelism(df), vec_col).where(F.col("norm") > 0)
    p = _pivot_side(pivots, vec_col, id_col)
    dot = DOT_EXPR.format(a=vec_col, b="p_vec")
    scored = base.crossJoin(F.broadcast(p)).withColumn(
        "pcos", F.expr(dot) / (F.col("norm") * F.col("p_norm"))
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("pcos"), (-F.col("pivot_id")).alias("npid"))).alias("m"),
        F.first(vec_col).alias(vec_col),
        F.first("norm").alias("norm"),
    )
    return best.select(
        id_col, vec_col, "norm", (-F.col("m.npid")).cast("bigint").alias("pivot_id")
    )


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    pivots: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-Flat approximate top-k: per query, exact cosine search
    restricted to the inverted lists of its ``nprobe`` nearest pivots.
    Returns (query_id, neighbor_id, rank)."""
    from pyspark.sql.window import Window

    assigned = ivf_assignments(df, pivots, vec_col, id_col)
    p = _pivot_side(pivots, vec_col, id_col)
    q = with_norm(queries, vec_col).where(F.col("norm") > 0).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    qdot = DOT_EXPR.format(a="q_vec", b="p_vec")
    wq = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.col("pivot_id"))
    probes = (
        q.crossJoin(F.broadcast(p))
        .withColumn("qcos", F.expr(qdot) / (F.col("q_norm") * F.col("p_norm")))
        .withColumn("prank", F.row_number().over(wq))
        .where(F.col("prank") <= nprobe)
        .select("query_id", "q_vec", "q_norm", "pivot_id")
    )
    dot = DOT_EXPR.format(a=vec_col, b="q_vec")
    scored = (
        assigned.join(F.broadcast(probes), "pivot_id")
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", F.expr(dot) / (F.col("norm") * F.col("q_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col(id_col).cast("bigint").alias("neighbor_id"),
            F.col("rank").cast("bigint"),
        )
    )


def ivf_recall_vs_exact(
    df: DataFrame,
    queries: DataFrame,
    pivots: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Measured recall@k of the IVF path against the exact baseline —
    one row (n_queries, n_exact, n_hit, recall_e4), the IVF analogue
    of :func:`lsh_recall_vs_exact`."""
    exact = cosine_topk(df, queries, k=k, vec_col=vec_col, id_col=id_col)
    approx = ivf_topk(
        df, queries, pivots, k=k, nprobe=nprobe, vec_col=vec_col, id_col=id_col
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    return (
        exact.agg(
            F.countDistinct("query_id").alias("nq"),
            F.count(F.lit(1)).alias("n_exact"),
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            F.col("nq").cast("bigint").alias("n_queries"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.round(F.col("n_hit") * 10000.0 / F.col("n_exact")).cast("bigint").alias("recall_e4"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    pivots: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster every embedding to its nearest pivot
    (the IVF coarse assignment — broadcast pivots, map-side argmax),
    compare cosines ONLY within a cluster, and keep each document iff
    it has no lower-id near-duplicate in its cluster.

    Returns (vec_id, pivot_id, keep) for every nonzero vector.

    Scale shape: the pairwise stage is an equi-join on ``pivot_id`` —
    never a cross join.  With K pivots sized so clusters hold ~N/K
    vectors (SemDeDup uses K ≈ sqrt(N)·c), each cluster's quadratic
    compare is bounded and AQE splits skewed clusters; at 100 TB
    ``pivot_id`` is the table's bucketing column so the self-join is
    co-located.  The keep policy (drop the larger id of any
    over-threshold pair) is the paper's deterministic one-survivor
    rule restricted to clusters, exactly mirrorable in SQL — no
    transitive closure needed because every member of a dup group
    shares the group's minimum id as a lower-id neighbor only through
    in-cluster pairs, which is the SemDeDup contract (cross-cluster
    dups are accepted misses, measured separately by the recall
    queries)."""
    assigned = ivf_assignments(df, pivots, vec_col, id_col)
    a = assigned.select(
        "pivot_id",
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("va"),
        F.col("norm").alias("na"),
    )
    b = assigned.select(
        "pivot_id",
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"),
    )
    dot = DOT_EXPR.format(a="va", b="vb")
    dropped = (
        a.join(b, ["pivot_id"])
        .where(F.col("a") < F.col("b"))
        .where(F.expr(dot) / (F.col("na") * F.col("nb")) >= threshold)
        .select(F.col("b").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return assigned.join(dropped, [id_col], "left").select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.col("pivot_id").cast("bigint").alias("pivot_id"),
        F.col("_dropped").isNull().alias("keep"),
    )
