"""Full training-corpus pipeline composition over the synthetic pages
corpus: extract → quality gate → exact + near dedup → scrub →
fingerprint, as one lazy DataFrame plan."""

from pyspark.sql import functions as F

from gumbo_pp_spark.pipelines import build_training_corpus
from gumbo_pp_spark.sources.pages import synth_pages, synth_pages_bench

from .conftest import SF_SMOKE


def test_pipeline_unique_clean_corpus(spark):
    pages = synth_pages(spark, SF_SMOKE).select("doc_id", "url", "html")
    corpus = build_training_corpus(pages).cache()
    n = corpus.count()
    assert 0 < n <= 500
    # exact dedup guarantee: fingerprints unique
    assert corpus.select("fp_md5").distinct().count() == n
    # extraction ran: text starts with the known heading
    sample = corpus.orderBy("doc_id").limit(5).collect()
    for r in sample:
        assert r.clean_text.startswith(f"Heading {r.doc_id}")
        assert r.n_tokens > 0


def test_pipeline_drops_replicated_near_dups(spark):
    # bench corpus replicates every document 4x with tiny suffix edits
    # (rep-N) — near-dup banding must collapse most replicas
    pages = synth_pages_bench(spark, SF_SMOKE, replicate=4, paragraphs=2).select(
        F.col("page_id").alias("doc_id"), "url", "html"
    )
    corpus = build_training_corpus(pages, near_dup_min_equal=7)
    n_in = pages.count()
    n_out = corpus.count()
    assert n_out < n_in / 2, (n_in, n_out)


def test_pipeline_drops_repetitive_docs(spark):
    # a degenerate looping page (one word repeated) must be gated out
    from gumbo_pp_spark.pipelines import build_training_corpus

    rows = [
        (1, "https://a.example/1",
         bytearray(("<html><body><p>" + "spam " * 60 + "</p></body></html>").encode())),
        (2, "https://a.example/2",
         bytearray(("<html><body><p>" + " ".join(f"w{i} the of and to in is on it go" for i in range(12))
                    + "</p></body></html>").encode())),
    ]
    pages = spark.createDataFrame(rows, "doc_id bigint, url string, html binary")
    out = build_training_corpus(pages, min_tokens=20, min_alpha_ratio_e4=5000)
    kept = {r.doc_id for r in out.collect()}
    assert kept == {2}
