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
# (sf0.1 → 80k pages, ~0.44 GB html)
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
    # round-7 families: semantic dedup, model gate, graph, PDF parse
    "semantic_dedup",
    "quality_classifier",
    "pagerank",
    "pdf_text",
    # round-7 session-3 families: markdown tier, charset sniff, REP gate
    "html_markdown",
    "charset_extract",
    "robots_gate",
    # round-7 session-4 families: domain gates, LM scoring, assembly
    "host_quality_gate",
    "remove_boilerplate",
    "lm_coverage",
    "select_token_budget",
]


def make_session(master: str, shuffle_partitions: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(master)
        .appName(f"gumbo_pp_spark-bench-{master}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # ROUND-5 RETUNE for the C parse engine: with parse ~10x
        # faster, the round-4 1024-row/8MB settings (tuned when parse
        # dominated) left the job per-batch/per-task overhead-bound.
        # Interleaved A/B duels (3 sessions, 2 passes each, b1024_p8
        # vs b4096_p16 vs b10000_p32 at local[8]+local[32]): 4096/16MB
        # had the best median AND the tightest spread at both levels
        # (local[8] ~15-20% over 1024/8; local[32] medians 2.7s vs
        # ~4.9s with 1024/8's wild 1.3-28.8s spread); 10000/32MB was
        # fastest in lucky windows but straggler-bound in others.
        # Batches still pipeline JVM scan against Python parse
        # (several batches in flight per 16MB task).
        .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
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


def stage_extract(master: str, pages_dir: str, runs: int = 5, waves: int = 4) -> dict:
    """The timed job: scan → parse → extract → aggregate."""
    from pyspark.sql import functions as F

    from gumbo_pp_spark.operators.extract import extract_main_text

    n_threads = int(master.split("[")[1].rstrip("]"))
    # driver-side prebuild: local-mode workers share this checkout, so
    # building here means no worker ever invokes gcc
    from gumbo_pp_spark.parser import cengine

    cengine.available()
    spark = make_session(master, n_threads)
    spark.sparkContext.setLogLevel("ERROR")
    # ROUND-6: level-aware splits.  The static 16MB of make_session
    # (with the 4MB openCost default) packed the 128 small bench files
    # into ~32 splits at EVERY level → local[32] ran ONE task wave and
    # its wall was the single slowest task on a steal-spiky VM
    # (BENCH_r05: all six local[32] runs ≥ 12.45s while local[8] hit
    # 2.35s).  Target ≥3 waves × threads from ON-DISK bytes instead.
    from gumbo_pp_spark.plans.partitioning import tune_input_splits

    # cores=CPUS at EVERY level: the N vs 4N gate compares the SAME
    # split plan (same job, same input) at two parallelism levels —
    # sizing per-level would hand the small level fewer, cheaper tasks
    # and measure per-task overhead instead of scaling
    split_bytes = (
        tune_input_splits(spark, pages_dir, waves=waves, cores=CPUS) if waves else 16 << 20
    )
    pages = spark.read.parquet(pages_dir)
    n_splits = pages.rdd.getNumPartitions()
    # warm the file listing / JVM before timing
    n_docs = pages.count()
    in_bytes = pages.select(F.sum(F.length("html"))).collect()[0][0]
    # spawn + warm the Python workers (imports, Arrow setup) AND the OS
    # page cache so the timed section measures steady-state throughput
    warm = extract_main_text(
        pages.limit(n_threads * 8).repartition(n_threads), passthrough=("page_id",)
    )
    warm.count()
    # min-of-N in one JVM: the sandbox VM has bursty co-tenant noise on
    # tens-of-seconds timescales; the minimum is the clean steady-state
    walls = []
    agg = None
    for _ in range(runs):
        # a 45s budget: co-tenant bursts last tens of seconds — running
        # into one wastes a whole measurement, so waiting longer is the
        # cheaper side of the trade
        wait_for_idle(timeout_s=45.0)
        t0 = time.time()
        out = extract_main_text(pages, passthrough=("page_id",))
        agg = out.select(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.length("text")).alias("out_chars"),
            F.sum("n_nodes").alias("nodes"),
            F.sum("parse_errors").alias("errs"),
        ).collect()[0]
        walls.append(time.time() - t0)
    wall = min(walls)
    spark.stop()
    return {
        "master": master,
        "docs": int(n_docs),
        "split_bytes": int(split_bytes),
        "n_splits": int(n_splits),
        "input_mb": round(in_bytes / 1e6, 1),
        "wall_sec": round(wall, 2),
        "wall_sec_runs": [round(w, 2) for w in walls],
        "docs_per_sec": round(n_docs / wall, 1),
        "mb_per_sec": round(in_bytes / 1e6 / wall, 1),
        "rows": int(agg["rows"]),
        "out_chars": int(agg["out_chars"]),
        "nodes": int(agg["nodes"]),
        "parse_errors": int(agg["errs"]),
    }


def wait_for_idle(threshold: float = 0.88, timeout_s: float = 60.0) -> None:
    """The sandbox VM has noisy co-tenants: block until 1-sec system
    idle share exceeds ``threshold`` (or give up after timeout)."""

    def snap():
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = list(map(int, parts[1:]))
        return sum(vals), vals[3]

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        tot0, idle0 = snap()
        time.sleep(1.0)
        tot1, idle1 = snap()
        if tot1 > tot0 and (idle1 - idle0) / (tot1 - tot0) >= threshold:
            return


def _mp_parse_worker(args):
    lo, hi = args
    from gumbo_pp_spark.operators.extract import _BOILER_ID_BYTES, main_text_program
    from gumbo_pp_spark.parser import cengine
    from gumbo_pp_spark.parser.html5 import parse_html

    global _MP_HTMLS
    # the SAME per-doc path the Spark job runs (C kernel fast path,
    # Python parse+kernel fallback), so the mp ceiling is a same-
    # workload calibration, not a slower proxy
    cx = cengine._cextract
    for h in _MP_HTMLS[lo:hi]:
        if cx is None or cx(h, _BOILER_ID_BYTES) is None:
            main_text_program(parse_html(h))
    return hi - lo


_MP_HTMLS: list = []


def hardware_ceiling(pages_dir: str, levels: tuple[int, ...]) -> dict:
    """Raw-multiprocessing parse throughput at each level — the box's
    own scaling ceiling for this allocation-heavy workload, independent
    of Spark.  Used to normalize the Spark scaling efficiency: a
    single-socket VM shares memory bandwidth across all workers,
    whereas 4N real executors bring 4N sockets' worth."""
    import multiprocessing as mp

    import pyarrow.parquet as pq

    global _MP_HTMLS
    _MP_HTMLS = pq.read_table(pages_dir, columns=["html"]).column("html").to_pylist()
    n = len(_MP_HTMLS)
    out = {}
    for nproc in levels:
        chunks = [(i * n // nproc, (i + 1) * n // nproc) for i in range(nproc)]
        best = None
        for _ in range(2):
            t0 = time.time()
            with mp.Pool(nproc) as p:
                p.map(_mp_parse_worker, chunks)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[f"mp{nproc}_docs_per_sec"] = round(n / best, 1)
    _MP_HTMLS = []
    return out


def _sha_worker(reps: int) -> int:
    import hashlib

    buf = b"x" * (1 << 20)
    h = 0
    for _ in range(reps):
        h ^= hashlib.sha256(buf).digest()[0]
    return h


def cpu_ceiling(levels: tuple[int, ...], reps: int = 120) -> dict:
    """Pure C-level compute (sha256 on a reused buffer — near-zero
    allocation) at each level.  On this sandbox VM even this caps well
    below 1.0, proving the ceiling is hypervisor CPU oversubscription,
    not the engine."""
    import multiprocessing as mp

    out = {}
    for nproc in levels:
        best = None
        for _ in range(2):
            t0 = time.time()
            with mp.Pool(nproc) as p:
                p.map(_sha_worker, [reps] * nproc)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[f"sha{nproc}_units_per_sec"] = round(reps * nproc / best, 1)
    return out


def run_subprocess_stage(master: str, pages_dir: str, runs: int = 5) -> dict:
    """Each parallelism level gets a fresh JVM (no executor reuse
    between the two measurements)."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--stage", "extract",
         "--master", master, "--pages", pages_dir, "--runs", str(runs)],
        capture_output=True, text=True, check=False, cwd=REPO,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"stage failed: {proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def run_levels_interleaved(pages_dir: str, levels: tuple[int, ...], passes: int = 4) -> dict:
    """ALTERNATE the two parallelism levels across several passes and
    take the per-level minimum.  A single sequential run per level lets
    one co-tenant noise burst poison an entire level (observed: the
    same local[32] job measured 12k docs/s in one window and 21k
    fifteen minutes later); interleaving gives both levels the same
    exposure to quiet windows."""
    best: dict[int, dict] = {}

    def one(n: int) -> None:
        r = run_subprocess_stage(f"local[{n}]", pages_dir, runs=2)
        if n not in best or r["wall_sec"] < best[n]["wall_sec"]:
            prev_runs = best[n]["wall_sec_runs"] if n in best else []
            r["wall_sec_runs"] = prev_runs + r["wall_sec_runs"]
            best[n] = r
        else:
            best[n]["wall_sec_runs"] += r["wall_sec_runs"]

    for _ in range(passes):
        for n in levels:
            one(n)
    # bonus passes: a level measuring slower in ABSOLUTE wall than the
    # level below it signals a noise-poisoned window somewhere in the
    # ladder.  Retry the WHOLE ladder, not just the slow level (ADVICE
    # r6: one-sided extra draws for the upper level bias the min-of-N
    # efficiency upward — contention can genuinely slow local[32], and
    # the estimator must give every level the same number of attempts).
    for _ in range(3):
        inconsistent = any(
            best[hi]["wall_sec"] > best[lo]["wall_sec"]
            for lo, hi in zip(levels, levels[1:])
        )
        if not inconsistent:
            break
        for n in levels:
            one(n)
    for n in levels:
        # equal by construction (full passes only); recorded so a gate
        # pass earned via retries is visible in the artifact
        best[n]["n_attempts"] = len(best[n]["wall_sec_runs"])
    return best


def matcher_microbench() -> dict[str, float]:
    """50k-node adversarial-DOM matcher micro-bench (driver-side, no
    Spark): a 5-matcher composed program over a deep repetitive page.
    Reports gated (candidate-set) evaluation vs the ungated
    AND-of-full-masks shape it replaced — the round-3 matcher-loop fix."""
    import numpy as np

    from gumbo_pp_spark import matchers as m
    from gumbo_pp_spark.parser.html5 import parse_html

    parts = ["<html><body>"]
    for i in range(10000):
        parts.append(
            f'<div class="c{i % 7}" data-k="v{i % 13}">'
            f'<span>row {i} text</span><a href="/l/{i}">link</a></div>'
        )
    parts.append("</body></html>")
    nt = parse_html("".join(parts))
    prog = (
        m.tag.DIV
        & m.attribute.value.starts_with("data-k", "v7")
        & m.content_text.contains("row 77")
        & ~m.class_type.is_("c3")
        & m.attribute.exists("data-k")
    )
    atoms = [
        m.tag.DIV,
        m.attribute.value.starts_with("data-k", "v7"),
        m.content_text.contains("row 77"),
        ~m.class_type.is_("c3"),
        m.attribute.exists("data-k"),
    ]
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        gated = prog.fn(nt)
    gated_ms = (time.time() - t0) / reps * 1000
    t0 = time.time()
    for _ in range(reps):
        full = np.logical_and.reduce([a.fn(nt) for a in atoms])
    full_ms = (time.time() - t0) / reps * 1000
    assert (gated == full).all()
    # round-4 cost-ordered conjunction: the SAME program with the
    # expensive text predicate written FIRST must evaluate at gated
    # speed too (the & operator reorders by cost rank)
    prog_rev = (
        m.content_text.contains("row 77")
        & m.attribute.value.starts_with("data-k", "v7")
        & ~m.class_type.is_("c3")
        & m.attribute.exists("data-k")
        & m.tag.DIV
    )
    t0 = time.time()
    for _ in range(reps):
        rev = prog_rev.fn(nt)
    rev_ms = (time.time() - t0) / reps * 1000
    assert (rev == full).all()
    return {
        "matcher_50k_nodes": nt.n,
        "matcher_gated_ms": round(gated_ms, 2),
        "matcher_gated_reversed_ms": round(rev_ms, 2),
        "matcher_ungated_ms": round(full_ms, 2),
        "matcher_speedup": round(full_ms / gated_ms, 2),
    }


def _warm_suite_session(spark) -> None:
    """Untimed warm-up before the per-query timing loop.  The FIRST
    job in a fresh local-mode session pays one-time costs that belong
    to no query: Python-worker fork + Arrow init (~1-2 s across the
    thread pool), the first parquet footer read, and the first
    shuffle-exchange setup.  The extraction stages already warm page
    cache + python workers before their timed min-of-N runs
    (stage_extract); this gives the suite loop the same discipline so
    per-query numbers measure the query, not session startup.
    BENCH_r05 evidence: html_main_text (always first) clocked 10.49 s
    over 5k docs (~2 ms/doc) while the same kernel over the same docs
    ran 4x faster one slot later — pure ordering effect."""
    from gumbo_pp_spark.operators.extract import extract_main_text
    from gumbo_pp_spark.sources.pages import synth_pages

    pages = synth_pages(spark, SF_DIR).limit(64).repartition(CPUS)
    extract_main_text(pages, passthrough=("doc_id",)).count()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.groupBy("l_returnflag").count().count()


def run_queries() -> dict[str, float]:
    import __spark_entry__ as entrymod

    spark = make_session(f"local[{CPUS}]", CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    _warm_suite_session(spark)
    qs = entrymod.queries()
    times: dict[str, float] = {}
    # min-of-2 over two ALTERNATED full passes (same protocol
    # rationale as the extraction stage's interleaved min-of-N:
    # bursty co-tenant noise lasts tens of seconds, so back-to-back
    # attempts of one query can both land in the same bad window —
    # round-robin passes decorrelate).  clearCache() before each
    # attempt so a query that persists intermediates (dedup signature
    # caches are keyed by analyzed plan) cannot feed its second run
    # from the first's InMemoryRelation.
    for _pass in range(2):
        for name in HEADLINE_QUERIES:
            spark.catalog.clearCache()
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.count()
            dt = time.time() - t0
            if name not in times or dt < times[name]:
                times[name] = dt
    # end-to-end pipeline number (not an oracle query): pages →
    # extract → quality/repetition gates → exact+near dedup → scrub →
    # fingerprint, one lazy plan over the sf pages table; same
    # min-of-2 + clearCache protocol, dedup signature caches scoped
    # per attempt so run 2 cannot feed from run 1's InMemoryRelation
    from gumbo_pp_spark.operators.dedup import cache_scope
    from gumbo_pp_spark.pipelines import build_training_corpus
    from gumbo_pp_spark.sources.pages import synth_pages

    best = None
    for _ in range(2):
        spark.catalog.clearCache()
        with cache_scope():
            t0 = time.time()
            build_training_corpus(
                synth_pages(spark, SF_DIR).select("doc_id", "url", "html")
            ).count()
            dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    times["training_corpus_pipeline"] = best

    times = {k: round(v, 2) for k, v in times.items()}
    spark.stop()
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None)
    ap.add_argument("--master", default=f"local[{CPUS}]")
    ap.add_argument("--pages", default=None)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--waves", type=int, default=4,
                    help="target task waves per core (0 = static 16MB splits)")
    args = ap.parse_args()

    if args.stage == "extract":
        print(json.dumps(stage_extract(args.master, args.pages, runs=args.runs,
                                       waves=args.waves)))
        return

    pages_dir = os.path.join(
        "/tmp",
        f"gumbo_bench_pages_{os.path.basename(SF_DIR)}_r{REPLICATE}p{PARAGRAPHS}",
    )
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        prepare_pages(pages_dir)

    # N→4N protocol (driver instruction): identical job + input at
    # local[8] and local[32], fresh JVM per level, levels ALTERNATED
    # across 3 passes with min-of-2 timed runs each (bursty co-tenant
    # noise poisons sequential per-level windows); the multiprocessing
    # calibration measures the VM's own scaling ceiling so Spark's
    # efficiency can be normalized.
    #
    # The 2→8 pair is the RAW-gate evidence (round 4): this VM's
    # hypervisor oversubscription caps ALL workloads (even pure-C
    # sha256) near 0.45 efficiency at 8→32, but below the
    # oversubscription knee (2→8 cores) compute still scales
    # near-linearly — so the same 4× parallelism ratio there yields a
    # raw Spark efficiency the driver can verify without trusting the
    # ceiling normalization.
    XLOW_CPUS = max(1, LOW_CPUS // 4)
    runs = run_levels_interleaved(pages_dir, (XLOW_CPUS, LOW_CPUS, CPUS))
    ceiling = hardware_ceiling(pages_dir, (XLOW_CPUS, LOW_CPUS, CPUS))
    cceil = cpu_ceiling((XLOW_CPUS, LOW_CPUS, CPUS))

    ratio = CPUS / LOW_CPUS
    spark_eff = round(
        runs[CPUS]["docs_per_sec"] / (ratio * runs[LOW_CPUS]["docs_per_sec"]), 3
    )
    ratio_lo = LOW_CPUS / XLOW_CPUS
    spark_eff_lo = round(
        runs[LOW_CPUS]["docs_per_sec"] / (ratio_lo * runs[XLOW_CPUS]["docs_per_sec"]), 3
    )
    hw_eff = round(
        ceiling[f"mp{CPUS}_docs_per_sec"] / (ratio * ceiling[f"mp{LOW_CPUS}_docs_per_sec"]), 3
    )
    ceiling.update(cceil)
    ceiling["sha_efficiency"] = round(
        cceil[f"sha{CPUS}_units_per_sec"] / (ratio * cceil[f"sha{LOW_CPUS}_units_per_sec"]), 3
    )
    ceiling["sha_efficiency_low_pair"] = round(
        cceil[f"sha{LOW_CPUS}_units_per_sec"]
        / (ratio_lo * cceil[f"sha{XLOW_CPUS}_units_per_sec"]), 3
    )

    qtimes = run_queries()
    total = round(sum(qtimes.values()) + runs[CPUS]["wall_sec"], 2)
    for n in (XLOW_CPUS, LOW_CPUS, CPUS):
        qtimes[f"extract_local{n}"] = runs[n]["wall_sec"]

    result = {
        "metric": "extraction+suite wall sec (extract timed at local[8] and local[32])",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0),
        "extraction": {
            **{f"local{n}": runs[n] for n in (XLOW_CPUS, LOW_CPUS, CPUS)},
            "parallelism_ratio": ratio,
            "scaling_efficiency": spark_eff,
            # raw N→4N pair below the VM's oversubscription knee
            "low_pair_ratio": ratio_lo,
            "scaling_efficiency_low_pair": spark_eff_lo,
            "hardware_ceiling": ceiling,
            "hardware_ceiling_efficiency": hw_eff,
            "normalized_scaling_efficiency": round(spark_eff / hw_eff, 3) if hw_eff else None,
        },
        "matcher_microbench": matcher_microbench(),
    }
    # Full artifact to disk; COMPACT line to stdout.  The driver
    # captures a bounded tail of stdout — BENCH_r06's line grew past
    # that window (per-run lists + ceiling sub-dicts) and the round's
    # canonical artifact came back unparseable ("parsed": null).
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "driver_last.json"), "w") as f:
        json.dump(result, f, indent=1)
    compact = dict(result)
    compact["extraction"] = dict(result["extraction"])
    keep = ("master", "docs", "wall_sec", "docs_per_sec", "mb_per_sec",
            "n_splits", "n_attempts", "parse_errors")
    for n in (XLOW_CPUS, LOW_CPUS, CPUS):
        full = result["extraction"][f"local{n}"]
        compact["extraction"][f"local{n}"] = {k: full[k] for k in keep if k in full}
    compact["extraction"]["hardware_ceiling"] = {
        k: ceiling[k] for k in ("sha_efficiency", "sha_efficiency_low_pair")
    }
    compact["detail"] = "BENCH/driver_last.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
