"""Iterative graph algorithms over edge DataFrames — PageRank.

Companion to the connected-components resolver in ``dedup.py``:
where components answer "which docs are the same", PageRank answers
"which hosts/docs matter" — the classic crawl-prioritization and
quality-prior signal for a web corpus.

All arithmetic is exact-integer (ranks are ``scale``-scaled bigints,
damping is a percent, divisions are floor DIV), so results are
bit-identical across engines and partitionings — integer sums commute,
float PageRank does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping_e2: int = 85,
    scale: int = 10**9,
    checkpoint: bool = True,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Simplified (dangling mass dropped, the usual web-graph variant)
    integer PageRank:  rank'(v) = (1−d)·scale + d · Σ_{u→v} rank(u) DIV
    outdeg(u), d = damping_e2/100.  Input (src, dst); returns
    (node, rank) with rank a ``scale``-scaled bigint.

    Scale shape per iteration: one join of the edge table with the
    node-sized rank table on ``src`` (at 10^12 edges the edge table is
    pre-partitioned/bucketed on src so the join co-locates; the rank
    side is node-sized, often broadcastable at host granularity) and
    one map-side-combined groupBy on ``dst``.  ``localCheckpoint``
    caps plan/lineage growth, same discipline as
    ``connected_components`` — O(iters) rounds, never a driver-side
    edge materialization.  Round 8: the checkpoint fires every
    ``checkpoint_every`` rounds instead of every round — each
    materialization forced an RDD round-trip that cost ~3× the actual
    rank math at bench scale (1.38 s → 0.49 s for 3 rounds), while
    lineage depth stays bounded at ``checkpoint_every`` iterations'
    worth of operators (identical ranks either way; short runs like
    the 3-round suite query never checkpoint at all)."""
    src_nodes = edges.select(F.col("src").cast("bigint").alias("node"))
    dst_nodes = edges.select(F.col("dst").cast("bigint").alias("node"))
    nodes = src_nodes.union(dst_nodes).distinct()
    outdeg = edges.groupBy(F.col("src").cast("bigint").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e = edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )
    base = (100 - damping_e2) * scale // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("bigint"))
    for it in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank DIV deg").alias("c"))
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, nodes["node"] == sums["dst"], "left")
            .selectExpr(
                "node",
                f"CAST({base} + ({damping_e2} * coalesce(s, 0)) DIV 100 AS BIGINT) AS rank",
            )
        )
        if checkpoint and (it + 1) % checkpoint_every == 0 and it + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("node").cast("bigint"), F.col("rank").cast("bigint"))


def hits(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 10**6,
    checkpoint: bool = True,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Integer-exact HITS (Kleinberg): per round the authority pass
    ``a'(v) = Σ_{u→v} h(u)`` then the hub pass ``h'(u) = Σ_{u→v}
    a(v)``, each MAX-normalized — ``x·scale DIV max(x')`` — instead of
    the float L2 norm, so every value stays a bigint, the fixed point
    is bit-exact (oracle-checkable), and rankings are unchanged
    (normalization is monotone).  Returns (node, hub, authority) as
    ``scale``-scaled bigints in [0, scale].

    Bounds: the normalization product ``s·scale`` must fit int64 —
    with the default 1e6 scale that allows hub/authority in-degrees up
    to ~9·10⁶ (document-graph hubs at web scale sit well under this at
    host granularity; raise ``n_iter``/precision only with the bound
    in mind — the DuckDB oracle errors loudly on overflow while Spark
    would wrap, so the suite family also guards the bound).

    Scale shape per round: two edge⋈rank joins (rank tables
    node-sized) + two map-side-combined aggs; each max is a 1-row
    broadcast cross join; ``localCheckpoint`` caps lineage growth like
    :func:`pagerank` / ``connected_components``."""
    e = edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = nodes.withColumn("h", F.lit(scale).cast("bigint"))

    def _norm(raw, key, val):
        m = raw.agg(F.coalesce(F.max(val), F.lit(1)).alias("_m"))
        return (
            nodes.join(raw, nodes["node"] == raw[key], "left")
            .crossJoin(F.broadcast(m))
            .selectExpr(
                "node",
                f"CAST(coalesce({val}, 0) * {scale} DIV _m AS BIGINT) AS {val}",
            )
        )

    a = None
    for it in range(n_iter):
        a_raw = (
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
        )
        a = _norm(a_raw, "dst", "a")
        h_raw = (
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
        )
        h = _norm(h_raw, "src", "h")
        # every k rounds, not every round (see pagerank): each lazy
        # localCheckpoint forced an RDD materialization round-trip
        # costing ~3× the rank math; k rounds of lineage stay bounded
        if checkpoint and (it + 1) % checkpoint_every == 0 and it + 1 < n_iter:
            a = a.localCheckpoint(eager=False)
            h = h.localCheckpoint(eager=False)
    return (
        nodes.join(h, "node")
        .join(a, "node")
        .select(
            F.col("node").cast("bigint"),
            F.col("h").cast("bigint").alias("hub"),
            F.col("a").cast("bigint").alias("authority"),
        )
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """(direction, degree, n_nodes): in/out-degree histogram of the
    link graph — the monitoring view for crawl-graph health (a fat
    out-degree tail is link farms, a fat in-degree tail is hubs to cap
    before ranking).  Two map-side-combined aggs per direction over
    the edge table, then node-sized histogram rollups."""
    def hist(col, label):
        deg = edges.groupBy(F.col(col).cast("bigint").alias("node")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        return deg.groupBy("degree").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes")
        ).select(F.lit(label).alias("direction"),
                 F.col("degree").cast("bigint"), "n_nodes")

    return hist("src", "out").unionByName(hist("dst", "in"))
