"""Round-8 optimization instrumentation (guide §1).  ``bench.py`` is
FROZEN for the driver's measurement; this harness adds what the
optimization loop needs without touching it:

* per-query timing with the SAME methodology as ``bench.run_queries``
  (min-of-N alternated passes, ``clearCache`` per attempt, ``count()``
  action) on any subset of queries;
* ``--mode noop`` isolation (``df.write.format("noop")``) so a query's
  computation is timed with every column materialized (guide §1.4);
* ``--explain DIR`` dumps ``explain("formatted")`` per query (the
  plans/r08 before/after artifacts);
* job labels (``setJobDescription``) so the UI/event log is readable.

Usage:
  python bench_extra.py                         # all headline queries, count mode
  python bench_extra.py --queries html_markdown,pdf_text --passes 3
  python bench_extra.py --mode noop --explain plans/r08 --suffix _before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (frozen harness: session config + query list)

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS


def _pipeline_df(spark):
    from gumbo_pp_spark.pipelines import build_training_corpus
    from gumbo_pp_spark.sources.pages import synth_pages

    return build_training_corpus(
        synth_pages(spark, SF_DIR).select("doc_id", "url", "html")
    )


def run(names: list[str], mode: str, passes: int, explain_dir: str | None,
        suffix: str) -> dict[str, float]:
    import __spark_entry__ as entrymod
    from gumbo_pp_spark.operators.dedup import cache_scope

    spark = bench.make_session(f"local[{CPUS}]", CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_suite_session(spark)
    qs = entrymod.queries()

    def build(name):
        if name == "training_corpus_pipeline":
            return _pipeline_df(spark)
        return qs[name](spark, SF_DIR)

    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        for name in names:
            with cache_scope():
                df = build(name)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            with open(os.path.join(explain_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)

    times: dict[str, float] = {}
    for _pass in range(passes):
        for name in names:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} pass{_pass}")
            with cache_scope():
                t0 = time.time()
                df = build(name)
                if mode == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                dt = time.time() - t0
            if name not in times or dt < times[name]:
                times[name] = dt
            spark.sparkContext.setJobDescription(None)
    times = {k: round(v, 2) for k, v in times.items()}
    spark.stop()
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None,
                    help="comma list; default headline + training pipeline")
    ap.add_argument("--mode", default="count", choices=("count", "noop"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dir for formatted plans")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    args = ap.parse_args()

    names = (
        args.queries.split(",")
        if args.queries
        else [*bench.HEADLINE_QUERIES, "training_corpus_pipeline"]
    )
    t0 = time.time()
    times = run(names, args.mode, args.passes, args.explain, args.suffix)
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0)
    except ValueError:
        sf = os.path.basename(SF_DIR.rstrip("/"))  # ad-hoc corpora keep the name
    out = {
        "sf": sf,
        "mode": args.mode,
        "passes": args.passes,
        "total": round(sum(times.values()), 2),
        "wall": round(time.time() - t0, 1),
        "queries": times,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
