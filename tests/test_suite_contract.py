"""Driver-contract invariants: every oracle key has a query, names are
stable, and the entry point returns the flagship schema."""

import __spark_entry__ as entrymod

from gumbo_pp_spark.suite import ORACLES, QUERIES


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_rows_only_queries_are_intentional():
    # queries without oracles get a weaker rows-only check — keep the
    # list explicit so additions are conscious decisions
    # round 2: every suite query is oracle-gated — keep it that way
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == set()


def test_driver_module_exports():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 29
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in os_.items():
        assert isinstance(sql, str) and sql.upper().lstrip().startswith(("SELECT", "WITH")), name


def test_entry_runs_flagship(spark):
    df = entrymod.entry(spark)
    assert {"doc_id", "url", "text", "spans", "n_nodes", "parse_errors"} <= set(df.columns)
    assert df.limit(5).count() == 5
