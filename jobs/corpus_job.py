"""spark-submit entry point for the end-to-end training-corpus
pipeline: pages → extract → quality/repetition gates → exact + near
dedup → PII scrub → fingerprinted parquet corpus.

Packaging (same as jobs/extract_job.py):

    cd /root/repo && zip -qr /tmp/gumbo_pp_spark.zip gumbo_pp_spark
    spark-submit --master local[32] \
        --py-files /tmp/gumbo_pp_spark.zip \
        jobs/corpus_job.py \
        --pages <pages parquet dir> --out <output dir> \
        [--near-dup-policy pairs|components] \
        [--embeddings <embeddings parquet dir>] \
        [--ann-recall-floor-e4 9000 | --ann-report-only] \
        [--min-tokens 20] [--near-dup-min-equal 7]

Prints one JSON line of run metrics (rows, caches_released,
ann_recall_e4/ok when the audit is enabled).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="input pages parquet dir")
    ap.add_argument("--out", required=True, help="output corpus parquet dir")
    ap.add_argument(
        "--near-dup-policy", choices=("pairs", "components"), default="pairs",
        help="near-dup drop rule: cheap pairwise (default) or "
        "component-exact one-per-cluster",
    )
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--near-dup-min-equal", type=int, default=7)
    ap.add_argument(
        "--embeddings", default=None,
        help="embeddings parquet dir — enables the in-pipeline ANN recall audit",
    )
    ap.add_argument("--ann-recall-floor-e4", type=int, default=None)
    ap.add_argument(
        "--ann-report-only", action="store_true",
        help="run the recall audit without a pass/fail floor",
    )
    args = ap.parse_args()
    if (args.ann_recall_floor_e4 is not None or args.ann_report_only) and not args.embeddings:
        ap.error("--ann-recall-floor-e4 / --ann-report-only require --embeddings "
                 "(without it no recall audit runs at all)")

    # driver-side C engine prebuild — same rationale as extract_job.py
    from gumbo_pp_spark.parser import cengine

    cengine.available()

    spark = (
        SparkSession.builder.appName("gumbo-corpus")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .getOrCreate()
    )

    from gumbo_pp_spark.pipelines import ANN_RECALL_FLOOR_E4, run_training_corpus
    from gumbo_pp_spark.plans.partitioning import tune_input_splits

    tune_input_splits(spark, args.pages, waves=3, max_split_bytes=64 << 20)
    pages = spark.read.parquet(args.pages)

    kwargs: dict = dict(
        min_tokens=args.min_tokens,
        near_dup_min_equal=args.near_dup_min_equal,
        near_dup_policy=args.near_dup_policy,
    )
    if args.embeddings:
        kwargs["embeddings"] = spark.read.parquet(args.embeddings)
        if args.ann_report_only:
            kwargs["ann_recall_floor_e4"] = None
        elif args.ann_recall_floor_e4 is not None:
            kwargs["ann_recall_floor_e4"] = args.ann_recall_floor_e4
        else:
            kwargs["ann_recall_floor_e4"] = ANN_RECALL_FLOOR_E4

    metrics = run_training_corpus(pages, args.out, **kwargs)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
