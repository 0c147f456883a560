"""Benchmark harness (driver contract + BASELINE.md scaling gate).

Measures the flagship extraction pipeline (parquet scan → Arrow batch
→ parse → boilerplate-strip extract → count/checksum) at TWO
parallelism levels on identical input — the in-sandbox evidence for
the north rule's N→4N executor scaling-efficiency ≥ 0.8 — plus the
headline suite queries at full parallelism.

Prints ONE JSON line:
  {"metric": ..., "value": <total suite sec at full cores>,
   "unit": "sec", "queries": {name: sec}, "sf": ...,
   "extraction": {"local8": {...}, "local32": {...},
                   "scaling_efficiency": E}}

Usage: python bench.py            (driver mode: full protocol)
       python bench.py --stage extract --master local[8] --pages DIR
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOW_CPUS = max(1, CPUS // 4)

# bench corpus shape: documents replicated with multi-paragraph bodies
REPLICATE = 16
PARAGRAPHS = 16

HEADLINE_QUERIES = [
    "html_main_text",
    "html_table_scrape",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality",
    "lang_id",
    "doc_fingerprints",
    "lineitem_agg",
    "events_sessions",
]


def make_session(master: str, shuffle_partitions: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(master)
        .appName(f"gumbo_pp_spark-bench-{master}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # parse cost ≫ scan cost: small input partitions keep all
        # threads busy and bound per-task Arrow memory
        .config("spark.sql.files.maxPartitionBytes", str(4 << 20))
        .config("spark.sql.files.openCostInBytes", str(1 << 20))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def prepare_pages(pages_dir: str) -> None:
    """Materialize the deterministic bench corpus once (shared by both
    parallelism levels so the input is identical)."""
    from gumbo_pp_spark.sources.pages import synth_pages_bench

    spark = make_session(f"local[{CPUS}]", CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth_pages_bench(spark, SF_DIR, replicate=REPLICATE, paragraphs=PARAGRAPHS)
    pages.repartition(CPUS * 4).write.mode("overwrite").parquet(pages_dir)
    spark.stop()


def stage_extract(master: str, pages_dir: str) -> dict:
    """The timed job: scan → parse → extract → aggregate."""
    from pyspark.sql import functions as F

    from gumbo_pp_spark.operators.extract import extract_main_text

    n_threads = int(master.split("[")[1].rstrip("]"))
    spark = make_session(master, n_threads)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_dir)
    # warm the file listing / JVM before timing
    n_docs = pages.count()
    in_bytes = pages.select(F.sum(F.length("html"))).collect()[0][0]
    # spawn + warm the Python workers (imports, Arrow setup) so the
    # timed section measures steady-state throughput on every thread
    warm = extract_main_text(
        pages.limit(n_threads * 8).repartition(n_threads), passthrough=("page_id",)
    )
    warm.count()
    t0 = time.time()
    out = extract_main_text(pages, passthrough=("page_id",))
    agg = out.select(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.length("text")).alias("out_chars"),
        F.sum("n_nodes").alias("nodes"),
        F.sum("parse_errors").alias("errs"),
    ).collect()[0]
    wall = time.time() - t0
    spark.stop()
    return {
        "master": master,
        "docs": int(n_docs),
        "input_mb": round(in_bytes / 1e6, 1),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "mb_per_sec": round(in_bytes / 1e6 / wall, 1),
        "rows": int(agg["rows"]),
        "out_chars": int(agg["out_chars"]),
        "nodes": int(agg["nodes"]),
        "parse_errors": int(agg["errs"]),
    }


def run_subprocess_stage(master: str, pages_dir: str) -> dict:
    """Each parallelism level gets a fresh JVM (no executor reuse
    between the two measurements)."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--stage", "extract",
         "--master", master, "--pages", pages_dir],
        capture_output=True, text=True, check=False, cwd=REPO,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"stage failed: {proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def run_queries() -> dict[str, float]:
    import __spark_entry__ as entrymod

    spark = make_session(f"local[{CPUS}]", CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.count()
        times[name] = round(time.time() - t0, 2)
    spark.stop()
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None)
    ap.add_argument("--master", default=f"local[{CPUS}]")
    ap.add_argument("--pages", default=None)
    args = ap.parse_args()

    if args.stage == "extract":
        print(json.dumps(stage_extract(args.master, args.pages)))
        return

    pages_dir = os.path.join("/tmp", f"gumbo_bench_pages_{os.path.basename(SF_DIR)}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        prepare_pages(pages_dir)

    low = run_subprocess_stage(f"local[{LOW_CPUS}]", pages_dir)
    high = run_subprocess_stage(f"local[{CPUS}]", pages_dir)
    ratio = CPUS / LOW_CPUS
    efficiency = round(high["docs_per_sec"] / (ratio * low["docs_per_sec"]), 3)

    qtimes = run_queries()
    total = round(sum(qtimes.values()) + high["wall_sec"], 2)
    qtimes[f"extract_local{LOW_CPUS}"] = low["wall_sec"]
    qtimes[f"extract_local{CPUS}"] = high["wall_sec"]

    result = {
        "metric": "extraction+suite wall sec (extract timed at both parallelism levels)",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0),
        "extraction": {
            f"local{LOW_CPUS}": low,
            f"local{CPUS}": high,
            "parallelism_ratio": ratio,
            "scaling_efficiency": efficiency,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
