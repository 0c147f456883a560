"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship boilerplate-strip extraction over the
deterministic synthetic pages table at sf0.001.
``queries()`` / ``oracle_sql()`` — the full operator suite
(SURVEY.md §2 inventory + web-scale pipeline ops) with DuckDB oracles;
see ``gumbo_pp_spark/suite.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gumbo_pp_spark.operators.extract import extract_main_text
    from gumbo_pp_spark.sources.pages import synth_pages

    pages = synth_pages(spark, "/root/testdata/sf0.001")
    return extract_main_text(pages, passthrough=("doc_id", "url"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gumbo_pp_spark.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gumbo_pp_spark.suite import ORACLES

    return dict(ORACLES)
