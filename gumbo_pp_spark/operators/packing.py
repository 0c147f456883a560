"""Training-data assembly operators: sequence packing and sliding-
window chunking.

These sit downstream of extraction/filtering in an LLM data pipeline:
``pack_sequences`` maps each document to the fixed-length training
sequences it occupies (GPT-style concat-and-split packing), and
``chunk_tokens`` cuts overlapping token windows for embedding / RAG
indexing.  Both are pure ``pyspark.sql`` expressions (JVM-side,
whole-stage codegen; no Python UDFs) so a DuckDB oracle recomputes
them bit-for-bit.

Scale notes (100 TB design):
* ``pack_sequences`` — packing needs a running token offset, i.e. an
  ordered prefix sum.  A GLOBAL order would serialize the corpus
  through one sort; instead the stream is sharded (``doc_id %
  n_shards``) and each shard packs independently — the window is
  shard-partitioned, shards scale out with the cluster, and a killed
  job re-packs only its shard.  This mirrors how production packers
  work (per-shard token streams, one output file per shard).
* ``chunk_tokens`` — map-only explode; output size is input size ×
  (width / stride), no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-split sequence packing: within each shard, documents
    are concatenated in ``doc_id`` order into one token stream that is
    cut every ``seq_len`` tokens; each document maps to the range of
    training sequences it lands in.

    Returns (doc_id, shard, n_tokens, start_tok, first_seq, last_seq,
    n_seqs) — ``start_tok`` is the document's offset in its shard's
    token stream, ``first_seq``/``last_seq`` the shard-local sequence
    ids it spans (a document crossing a cut belongs to several).

    Tokens are whitespace words here; swap the ``n_tokens`` expression
    for a real tokenizer count upstream — the packing math is
    tokenizer-agnostic.
    """
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError(f"seq_len={seq_len} and n_shards={n_shards} must be positive")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = df.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        (F.col("doc_id") % n_shards).cast("bigint").alias("shard"),
        F.expr(f"CAST(size(split({text_col}, ' ')) AS BIGINT)").alias("n_tokens"),
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    c = t.withColumn("start_tok", start)
    return c.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_tok",
        F.floor(F.col("start_tok") / seq_len).cast("bigint").alias("first_seq"),
        F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / seq_len)
        .cast("bigint")
        .alias("last_seq"),
        (
            F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / seq_len)
            - F.floor(F.col("start_tok") / seq_len)
            + 1
        )
        .cast("bigint")
        .alias("n_seqs"),
    )


def chunk_tokens(
    df: DataFrame,
    width: int = 32,
    stride: int = 24,
    text_col: str = "text",
) -> DataFrame:
    """Sliding token windows with overlap (embedding / RAG chunking):
    chunks start at token 0, ``stride``, 2·``stride``, … while the
    start is inside the document; each chunk holds up to ``width``
    tokens (the final chunk may be short).  ``stride == width`` is
    non-overlapping (``textstats.paragraph_chunks``); ``stride <
    width`` overlaps by ``width - stride`` tokens.

    Returns (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk).
    Map-only: one projection + explode, no shuffle.
    """
    if width <= 0 or stride <= 0:
        raise ValueError(f"width={width} and stride={stride} must be positive")
    # project the split once: Spark does not hoist loop-invariant
    # subexpressions out of higher-order-function lambdas (see
    # dedup.shingles), so the lambda below must use a bound array col
    return (
        df.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.expr(f"split({text_col}, ' ')").alias("ws"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws), {stride}), "
                    f"(j, i) -> struct(CAST(i AS BIGINT) AS chunk_id, "
                    f"CAST(j - 1 AS BIGINT) AS start_tok, "
                    f"CAST(least({width}, size(ws) - j + 1) AS BIGINT) AS n_chunk_tokens, "
                    f"concat_ws(' ', slice(ws, j, {width})) AS chunk))"
                )
            ).alias("c"),
        )
        .select("doc_id", "c.chunk_id", "c.start_tok", "c.n_chunk_tokens", "c.chunk")
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Training-export shard manifest: assign every document a
    deterministic shard (md5-domain uniform on doc_id — retry-stable,
    no RNG) and emit one integrity row per shard:
    (shard, n_docs, n_tokens, min_doc, max_doc, checksum).

    ``checksum`` is bit_xor of the 32-bit text hashes — order-
    independent, so a re-export after resume/retry must reproduce it
    bit-for-bit; a reader validates a downloaded shard against the
    manifest without trusting file metadata.

    Scale shape: one map-side-combined groupBy on the shard key
    (n_shards groups total); the assignment expression is map-only.
    The manifest (n_shards rows) is the commit artifact an export job
    writes LAST, after all shard files — the same two-phase pattern as
    the lineage ledger."""
    u32 = "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    t32 = f"CAST(conv(substring(md5({text_col}), 1, 8), 16, 10) AS BIGINT)"
    return (
        df.selectExpr(
            f"{u32} % {n_shards} AS shard",
            "doc_id",
            f"size(split({text_col}, ' ')) AS n_toks",
            f"{t32} AS th",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
            F.expr("bit_xor(th)").cast("bigint").alias("checksum"),
        )
        .select("shard", "n_docs", "n_tokens", "min_doc", "max_doc", "checksum")
    )


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    score_col: str,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Greedy corpus assembly under a token budget: keep the
    highest-scoring documents whose running token total fits in
    ``budget_tokens``.  Order is (score desc, key asc); a document is
    kept iff the cumulative token count through it is ≤ the budget
    (tokens are positive, so the kept set is a clean prefix).
    Returns (doc_id, score, n_tokens).

    Scale shape — NO global sort: the score axis collapses to a
    per-distinct-score histogram (map-side combined, scores-sized,
    the :func:`~gumbo_pp_spark.operators.sketches.length_quantiles`
    trick); scores whose whole cumulative mass fits are kept via a
    broadcast semi-join flag, and only the single BOUNDARY score's
    documents flow through a cumulative window — partitioned AFTER
    the boundary filter, so the window input is boundary-sized, not
    corpus-sized.  A corpus where one score value dominates would
    re-concentrate that window; integer e4 scores make that a
    measure-zero concern in practice."""
    base = df.selectExpr(
        f"CAST({key_col} AS BIGINT) AS doc_id",
        f"CAST({score_col} AS BIGINT) AS score",
        f"CAST(size(split({text_col}, ' ')) AS BIGINT) AS n_tokens",
    )
    hist = base.groupBy("score").agg(F.sum("n_tokens").alias("tok"))
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "score",
        F.sum("tok").over(w).alias("cum"),
        (F.sum("tok").over(w) - F.col("tok")).alias("cum_before"),
    )
    full_in = cum.where(F.col("cum") <= budget_tokens).select("score")
    boundary = cum.where(
        (F.col("cum") > budget_tokens) & (F.col("cum_before") < budget_tokens)
    ).select("score", "cum_before")
    kept_full = base.join(F.broadcast(full_in), "score")
    wb = Window.partitionBy("score").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    kept_boundary = (
        base.join(F.broadcast(boundary), "score")
        .withColumn("c", F.sum("n_tokens").over(wb))
        .where(F.col("cum_before") + F.col("c") <= budget_tokens)
    )
    cols = ["doc_id", "score", "n_tokens"]
    return kept_full.select(*cols).unionByName(kept_boundary.select(*cols))
