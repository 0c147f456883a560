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
