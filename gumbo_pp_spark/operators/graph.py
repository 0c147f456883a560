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
    caps plan/lineage growth per round, same discipline as
    ``connected_components`` — O(iters) rounds, never a driver-side
    edge materialization."""
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
    for _ in range(n_iter):
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
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("node").cast("bigint"), F.col("rank").cast("bigint"))
