"""Distributed frequency sketches — Count-Min heavy hitters.

A Count-Min sketch is the classic one-pass, fixed-memory frequency
summary (Cormode & Muthukrishnan 2005): ``depth`` hash rows of
``width`` counters; est(word) = min over rows of the counter its hash
lands in, and est ≥ true count always (collisions only ever inflate).

Scale shape: the build is one map-side-combined groupBy over
(row, bucket) — the shuffle carries at most depth·width groups per
partition no matter how many tokens went in, and the finished sketch
is depth·width rows TOTAL (KBs), independent of corpus size.  Query-
side estimation therefore broadcasts the sketch and never shuffles
the candidate stream by word — the whole point versus an exact
groupBy(word) at 10^12 rows.  Hashing is the repo-standard md5 idiom
(row-salted: md5('<r>|' || word)) so the DuckDB oracle recomputes the
identical counters bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

U32 = "CAST(conv(substring(md5({x}), 1, 8), 16, 10) AS BIGINT)"


def _bucket_expr(r: int, width: int, word_col: str = "word") -> str:
    salted = U32.format(x=f"concat('{r}|', {word_col})")
    return f"CAST({salted} % {width} AS BIGINT)"


def cms_sketch(
    df: DataFrame, width: int = 16, depth: int = 3, text_col: str = "text"
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt), ≤ depth·width rows total.

    The token stream is exploded once and stacked ``depth`` times
    (one (row, bucket) key per hash row); partial aggregation
    collapses each partition's stack to ≤ depth·width rows before the
    exchange, so the shuffle is constant-size regardless of input."""
    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    toks = ensure_min_parallelism(df).select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    stacked = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("row"),
                        F.expr(_bucket_expr(r, width)).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    )
    return stacked.groupBy("rb.row", "rb.bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_heavy_hitters(
    df: DataFrame,
    width: int = 16,
    depth: int = 3,
    min_count: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Heavy hitters by CMS estimate: (word, est) for every distinct
    word whose sketch estimate reaches ``min_count``, est = min over
    the ``depth`` row counters.  est ≥ true count (one-sided error),
    so no true heavy hitter is ever missed; collision-inflated light
    words are the documented false-positive mass, bounded by
    width/depth sizing.

    The candidate side here is the corpus' own distinct words (a
    monitoring query); in production the sketch is the broadcast
    artifact and candidates arrive from outside (alert lists, probe
    vocab) without touching the corpus again."""
    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    sketch = cms_sketch(df, width=width, depth=depth, text_col=text_col)
    words = (
        ensure_min_parallelism(df)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .distinct()
    )
    probes = words.select(
        "word",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("row"),
                        F.expr(_bucket_expr(r, width)).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("word", "rb.row", "rb.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("word")
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )
    return est.where(F.col("est") >= min_count).select("word", "est")


def kmv_distinct(df: DataFrame, k: int = 16, text_col: str = "text") -> DataFrame:
    """KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002):
    keep the ``k`` smallest 32-bit word hashes; if the k-th smallest
    is h_k, the hashes are ~uniform on [0, 2^32) and
    est = (k−1)·2^32 / h_k.  One row: (k_used, kth_hash, est_distinct)
    — exact integers, so the oracle matches bit-for-bit.

    Scale shape: dedup happens by partial aggregation on the hash (the
    shuffle carries at most |vocab| rows per partition, never the
    token stream) and the bottom-k is Spark's TakeOrderedAndProject —
    a per-partition k-heap merged on the driver, the same merge a
    production KMV union does.  The sketch is k numbers; unions of
    per-shard sketches merge by re-taking the k smallest."""
    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    h = (
        ensure_min_parallelism(df)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .select(F.expr(U32.format(x="word")).alias("h"))
        .distinct()
    )
    botk = h.orderBy("h").limit(k)
    return botk.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.max("h").cast("bigint").alias("kth_hash"),
    ).selectExpr(
        "k_used",
        "kth_hash",
        f"CAST((k_used - 1) * {1 << 32} DIV kth_hash AS BIGINT) AS est_distinct",
    )


def length_quantiles(
    df: DataFrame,
    probs_e2: tuple[int, ...] = (25, 50, 75, 90, 99),
    text_col: str = "text",
) -> DataFrame:
    """Exact corpus quantiles of document token length WITHOUT a
    global sort or driver collect: (p_e2, value) where value is the
    smallest length whose cumulative count covers p% of documents
    (type-1 quantile).

    Scale shape: the length distribution collapses to one row per
    DISTINCT length (map-side combined groupBy — thousands of rows at
    any corpus size, the same trick as the frequency histogram); the
    cumulative sum and the probe run over that tiny table, so the
    only corpus-sized stage is the first map+partial-agg.  This is
    the exact-histogram cousin of a t-digest: for integer-valued
    statistics the histogram IS the sketch, no approximation needed."""
    from pyspark.sql import Window

    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    lens = (
        ensure_min_parallelism(df)
        .selectExpr(f"size(split({text_col}, ' ')) AS len")
        .groupBy("len")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    cum = lens.select(
        "len",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("len").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    probs = ", ".join(str(p) for p in probs_e2)
    probed = cum.crossJoin(
        F.broadcast(
            df.sparkSession.range(1).selectExpr(f"explode(array({probs})) AS p_e2")
        )
    ).where(F.col("cum") * 100 >= F.col("p_e2") * F.col("total"))
    return (
        probed.groupBy("p_e2")
        .agg(F.min("len").alias("value"))
        .select(F.col("p_e2").cast("bigint"), F.col("value").cast("bigint"))
    )


def grouped_length_quantiles(
    df: DataFrame,
    group_col: str = "source",
    probs_e2: tuple[int, ...] = (25, 50, 75, 90, 99),
    text_col: str = "text",
) -> DataFrame:
    """(grp, p_e2, value): exact per-group token-length quantiles —
    :func:`length_quantiles` generalized to a grouping key (per-source
    length profiles are how mixture policies get calibrated).  Same
    scale shape: the corpus-sized stage is ONE map-side-combined
    groupBy collapsing to a row per (group, distinct length); the
    cumulative windows and the probe run per group over that tiny
    table (window partitioned by group — no single-partition stage at
    any group count, unlike the ungrouped form's one-row-total
    window)."""
    from pyspark.sql import Window

    from gumbo_pp_spark.plans.partitioning import ensure_min_parallelism

    lens = (
        ensure_min_parallelism(df)
        .selectExpr(
            f"{group_col} AS grp", f"size(split({text_col}, ' ')) AS len"
        )
        .groupBy("grp", "len")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy("len").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("grp")
    cum = lens.select(
        "grp",
        "len",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    probs = ", ".join(str(p) for p in probs_e2)
    probed = cum.crossJoin(
        F.broadcast(
            df.sparkSession.range(1).selectExpr(f"explode(array({probs})) AS p_e2")
        )
    ).where(F.col("cum") * 100 >= F.col("p_e2") * F.col("total"))
    return (
        probed.groupBy("grp", "p_e2")
        .agg(F.min("len").alias("value"))
        .select("grp", F.col("p_e2").cast("bigint"), F.col("value").cast("bigint"))
    )
