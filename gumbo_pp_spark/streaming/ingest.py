"""Structured Streaming ingest variant of the extraction pipeline.

The reference is batch-only (SURVEY.md §2.5: no streams); this module
is the engine's forward-looking ingest path for a continuously-crawled
corpus: a file-source stream of page parquet drops runs the SAME
``extract_main_text`` map stage per micro-batch (mapInPandas works
unchanged on streaming DataFrames), plus a watermarked windowed
aggregation for late-arriving events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """readStream(files) → parse/extract → writeStream(parquet).
    Returns the started query; use trigger availableNow + awaitTermination
    for drain-and-stop semantics in tests/backfills."""
    from ..operators.extract import extract_main_text

    pages = spark.readStream.schema(schema).parquet(input_dir)
    out = extract_main_text(pages, passthrough=("doc_id", "url"))
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_hourly_counts(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (late rows
    beyond the watermark are dropped; append-mode compatible)."""
    ev = spark.readStream.schema(schema).parquet(input_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w.start", "w.end", "event_type", "n")
    )


def stream_contamination_alerts(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    evals: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """Continuous contamination MONITOR: every (doc_id, gram) hit of an
    incoming document stream against a STATIC eval set, as an
    append-mode stream (route it to a quarantine/alerts sink).

    Shape: stream-static inner join — the eval n-grams are a batch
    DataFrame broadcast into every micro-batch, the stream side is the
    same map-only n-gram explode as the batch operator.  Stateless: no
    watermark, no streaming state, each micro-batch is independent.
    (A clean-stream variant cannot be a stream-stream anti join —
    unsupported — see :func:`stream_decontaminate`.)"""
    from ..operators.textstats import _ngram_expr, eval_ngrams

    grams = eval_ngrams(evals, n, text_col)  # static side, broadcast
    docs = spark.readStream.schema(schema).parquet(input_dir)
    ws = docs.withColumn("ws", F.split(F.col(text_col), " "))
    return (
        ws.where(F.expr(f"size(ws) >= {n}"))
        .select("doc_id", F.explode(F.expr(_ngram_expr(n))).alias("gram"))
        .join(F.broadcast(grams), "gram")
        .select("doc_id", "gram")
    )


def stream_decontaminate(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    evals: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """Continuously decontaminate a document stream: pass through only
    documents sharing NO word ``n``-gram with the static eval set.

    Spark cannot express "drop the parent row of any matching child"
    on a stream without a (unsupported) stream-stream anti join, so
    the eval grams are collected ONCE into a broadcast set — by
    definition benchmark-sized, the same object a batch broadcast
    join would ship — and the filter is one Arrow-batched predicate
    on the stream's map path (stateless, append-mode)."""
    from pyspark.sql.types import BooleanType
    import pandas as pd  # noqa: F401  (pandas_udf batch type)
    from pyspark.sql.functions import pandas_udf

    from ..operators.textstats import eval_ngrams

    gram_set = frozenset(
        r["gram"] for r in eval_ngrams(evals, n, text_col).collect()
    )
    bc = spark.sparkContext.broadcast(gram_set)

    @pandas_udf(BooleanType())
    def is_clean(texts):
        grams = bc.value
        out = []
        for t in texts:
            w = (t or "").split(" ")
            out.append(
                not any(
                    " ".join(w[i : i + n]) in grams
                    for i in range(len(w) - n + 1)
                )
            )
        import pandas as _pd

        return _pd.Series(out)

    docs = spark.readStream.schema(schema).parquet(input_dir)
    return docs.where(is_clean(F.col(text_col)))
