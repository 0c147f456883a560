"""Sitemap ingestion (sources/sitemaps.py): JVM-side from_xml parse
and the deterministic synthetic family."""

from gumbo_pp_spark.sources.sitemaps import parse_sitemaps, synth_sitemaps

from .conftest import SF_SMOKE

XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://h/a</loc><lastmod>2024-01-01</lastmod>"
    "<priority>0.8</priority></url>"
    "<url><loc>https://h/b</loc></url>"
    "</urlset>"
)


class TestParse:
    def test_entries_exploded(self, spark):
        df = spark.createDataFrame([("h", XML)], "host string, sitemap_xml string")
        rows = {r.loc: r for r in parse_sitemaps(df).collect()}
        assert set(rows) == {"https://h/a", "https://h/b"}
        assert rows["https://h/a"].lastmod == "2024-01-01"
        assert rows["https://h/a"].priority == 0.8
        assert rows["https://h/b"].lastmod is None  # optional fields null

    def test_malformed_xml_yields_zero_rows_not_failure(self, spark):
        df = spark.createDataFrame(
            [("h", "<urlset><url><loc>unclosed"), ("i", "not xml at all")],
            "host string, sitemap_xml string",
        )
        assert parse_sitemaps(df).count() == 0

    def test_plan_is_fully_jvm_side(self, spark):
        df = spark.createDataFrame([("h", XML)], "host string, sitemap_xml string")
        plan = parse_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
        for py_node in ("EvalPython", "InPandas", "PythonUDF", "MapInArrow"):
            assert py_node not in plan
        assert "Exchange" not in plan  # map-only: from_xml + explode


class TestSynthFamily:
    def test_one_sitemap_per_host_entries_ordered(self, spark):
        sm = synth_sitemaps(spark, SF_SMOKE).collect()
        xml = {r.host: r.sitemap_xml for r in sm}
        assert all(x.startswith('<?xml version="1.0"') for x in xml.values())
        # entries pinned in doc_id order inside each host's sitemap
        one = next(iter(xml.values()))
        import re

        ids = [int(m) for m in re.findall(r"/doc/(\d+)</loc>", one)]
        assert ids == sorted(ids) and len(ids) > 1
