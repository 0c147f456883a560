"""Crawl-politeness gate: RFC 9309 robots.txt evaluation over a URL
corpus.

Scale shape: the robots side is HOSTS-sized (orders of magnitude
smaller than the page corpus) → explicit ``broadcast`` hash join on
the url's host, zero shuffle of the corpus; rule evaluation is an
Arrow-batched kernel with a per-worker compiled-rules cache (one
``parse_robots`` per distinct robots.txt per worker, not per row —
within a batch the host column is heavily repeated, so the cache hit
rate is ~1).  Kernel in :mod:`gumbo_pp_spark.parser.robots`
(from-spec; RFC 9309 longest-match / allow-wins-ties semantics).
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

ROBOTS_HOST_COL = "__robots_host"
ROBOTS_TXT_COL = "__robots_txt"


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "gumbobot",
    url_col: str = "url",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """Append ``crawl_allowed`` to ``urls``.

    ``robots`` carries one row per host (``host_col, txt_col``); hosts
    absent from it — and null/empty bodies — are implicit allow-all
    per RFC 9309 §2.3.1.
    """
    import pyarrow as pa

    from ..parser.robots import parse_robots, url_path

    in_fields = [
        f"{f.name} {f.dataType.simpleString()}" for f in urls.schema.fields
    ]
    out_schema = ", ".join([*in_fields, "crawl_allowed boolean"])
    in_names = [f.name for f in urls.schema.fields]

    j = urls.join(
        F.broadcast(
            robots.select(
                F.col(host_col).alias(ROBOTS_HOST_COL),
                F.col(txt_col).alias(ROBOTS_TXT_COL),
            )
        ),
        F.expr(f"parse_url({url_col}, 'HOST')") == F.col(ROBOTS_HOST_COL),
        "left",
    ).drop(ROBOTS_HOST_COL)

    def fn(batches: Iterable[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cache: dict[str, object] = {}
        for batch in batches:
            txts = batch.column(ROBOTS_TXT_COL).to_pylist()
            us = batch.column(url_col).to_pylist()
            allowed = []
            for u, t in zip(us, txts):
                key = t or ""
                rf = cache.get(key)
                if rf is None:
                    rf = cache[key] = parse_robots(key)
                allowed.append(rf.allowed(agent, url_path(u or "")))
            yield pa.RecordBatch.from_arrays(
                [*(batch.column(c) for c in in_names),
                 pa.array(allowed, pa.bool_())],
                [*in_names, "crawl_allowed"],
            )

    return j.mapInArrow(fn, out_schema)


def crawl_schedule(
    robots: DataFrame,
    agent: str = "gumbobot",
    window_sec: int = 60,
    default_delay_ms: int = 1000,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """(host, crawl_delay_ms, fetch_budget): per-host politeness
    schedule from the de-facto ``Crawl-delay`` extension — the frontier
    shard sizer (a host's shard should hold at most ``fetch_budget``
    URLs per ``window_sec`` scheduling window).  Hosts whose selected
    agent group declares no delay get ``default_delay_ms``;
    ``fetch_budget = window_sec·1000 div crawl_delay_ms`` is one
    integer floor division (oracle-exact).  Scale shape: the input is
    the hosts-sized robots table — one Arrow map over it, no join, no
    shuffle; delays are plan constants downstream (broadcast the
    result onto the frontier)."""
    import pyarrow as pa

    from ..parser.robots import parse_robots

    def fn(batches: Iterable[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            hosts = batch.column(host_col).to_pylist()
            txts = batch.column(txt_col).to_pylist()
            delays = []
            for t in txts:
                d = parse_robots(t or "").crawl_delay(agent)
                delays.append(
                    default_delay_ms if d is None else int(round(d * 1000))
                )
            # floor at 1 fetch per window: a Crawl-delay longer than
            # the window (e.g. 120 s against the 60 s default — common
            # in real robots.txt) would otherwise yield budget 0 and
            # shard_frontier's `div fetch_budget` divides by zero
            # (NULL windows in non-ANSI Spark, a runtime error under
            # ANSI) — ADVICE r7
            budgets = [
                max(1, (window_sec * 1000) // d) if d > 0 else window_sec * 1000
                for d in delays
            ]
            yield pa.RecordBatch.from_arrays(
                [pa.array(hosts, pa.string()),
                 pa.array(delays, pa.int64()),
                 pa.array(budgets, pa.int64())],
                ["host", "crawl_delay_ms", "fetch_budget"],
            )

    return robots.select(
        F.col(host_col).cast("string").alias(host_col), txt_col
    ).mapInArrow(fn, "host string, crawl_delay_ms bigint, fetch_budget bigint")


def shard_frontier(
    frontier: DataFrame,
    schedule: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """(host, url, fetch_rank, fetch_window): assign every frontier URL
    to a politeness window — the k-th URL of a host (deterministic
    md5(url) order, url tie-break) fetches in window
    ``(k−1) div fetch_budget``, with budgets from
    :func:`crawl_schedule`.  Hosts absent from the schedule are
    unthrottled (window 0).

    Exact per-host rank WITHOUT one task per host: the first hex digit
    of md5(url) RANGE-buckets the sort key — the bucket is a PREFIX of
    the ordering, so ``global rank = per-(host, bucket) offset + rank
    within (host, bucket)`` holds exactly.  A crawl-heavy host spreads
    over 16 independent window tasks; the offset table is
    (hosts × 16)-sized and broadcast, as is the schedule."""
    from pyspark.sql import Window

    base = frontier.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.substring(F.md5(F.col(url_col)), 1, 1).alias("_bkt"),
    )
    w1 = Window.partitionBy("host", "_bkt").orderBy(F.md5("url"), "url")
    ranked = base.withColumn("_r", F.row_number().over(w1))
    wo = Window.partitionBy("host").orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    offs = (
        base.groupBy("host", "_bkt")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "host", "_bkt", (F.sum("_n").over(wo) - F.col("_n")).alias("_off")
        )
    )
    sched = schedule.select(F.col("host").alias("host"), "fetch_budget")
    return (
        ranked.join(F.broadcast(offs), ["host", "_bkt"])
        .join(F.broadcast(sched), "host", "left")
        .select(
            "host",
            "url",
            (F.col("_off") + F.col("_r")).cast("bigint").alias("fetch_rank"),
            F.expr(
                "CAST(CASE WHEN fetch_budget IS NULL THEN 0 "
                "ELSE (_off + _r - 1) div fetch_budget END AS BIGINT)"
            ).alias("fetch_window"),
        )
    )
