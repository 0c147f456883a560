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
