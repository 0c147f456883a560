"""Bigram-LM coverage scoring (integer-exact CCNet-perplexity
stand-in) and token-mixture rate calibration; beyond-reference
pipeline operators."""

from gumbo_pp_spark.operators import textstats as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestBigramLm:
    def test_topk_counts_multiplicity_and_ties(self, spark):
        docs = _docs(spark, [(1, "a b a b"), (2, "a b c d"), (3, "z z")])
        # counts: 'a b'=3 (twice in doc1 + doc2), everything else 1
        lm = {r.bigram: r.n for r in T.bigram_lm(docs, lm_size=1).collect()}
        assert lm == {"a b": 3}
        # the n=1 tie at the cut breaks lexicographically
        lm3 = [r.bigram for r in T.bigram_lm(docs, lm_size=3)
               .orderBy("bigram").collect()]
        assert lm3 == ["a b", "b a", "b c"]

    def test_single_word_docs_contribute_nothing(self, spark):
        docs = _docs(spark, [(1, "lonely"), (2, "x y")])
        assert T.bigram_lm(docs, lm_size=10).count() == 1


class TestLmCoverage:
    def test_coverage_values_exact(self, spark):
        docs = _docs(spark, [(1, "a b a b"), (2, "a b c d"), (3, "z z")])
        got = {
            r.doc_id: (r.n_bigrams, r.n_known, r.known_mass, r.coverage_e4)
            for r in T.lm_coverage(docs, lm_size=1).collect()
        }
        # LM = {'a b': 3}; doc1 bigrams [a b, b a, a b] -> 2 known
        assert got == {
            1: (3, 2, 6, 6667),
            2: (3, 1, 3, 3333),
            3: (1, 0, 0, 0),
        }

    def test_single_word_doc_absent(self, spark):
        docs = _docs(spark, [(1, "word"), (2, "a b")])
        ids = {r.doc_id for r in T.lm_coverage(docs, lm_size=4).collect()}
        assert ids == {2}

    def test_external_reference_model(self, spark):
        # the CCNet setup: model built on a trusted corpus, applied to
        # a crawled one
        ref = _docs(spark, [(1, "good text good text")])
        crawl = _docs(spark, [(9, "good text garbled junk")])
        lm = T.bigram_lm(ref, lm_size=10)
        (r,) = T.lm_coverage(crawl, lm=lm).collect()
        # crawl bigrams: [good text, text garbled, garbled junk] ->
        # only 'good text' known
        assert (r.n_bigrams, r.n_known, r.coverage_e4) == (3, 1, 3333)

    def test_model_side_is_broadcast(self, spark):
        from tests.test_physical_plans import plan_of

        docs = _docs(spark, [(1, "a b c")])
        plan = plan_of(T.lm_coverage(docs, lm_size=4))
        assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


class TestMixtureRates:
    def _src_docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id bigint, source string, text string"
        )

    def test_binding_source_kept_whole_others_scaled(self, spark):
        # a: 30 tokens, b: 10 tokens, equal targets -> b binds (runs
        # out first), a downsampled to match
        docs = self._src_docs(
            spark,
            [(1, "a", " ".join(["w"] * 30)), (2, "b", " ".join(["w"] * 10))],
        )
        got = {
            r.source: (r.n_tokens, r.rate_e4)
            for r in T.mixture_rates(docs, {"a": 5000, "b": 5000}).collect()
        }
        # rate_a = (10000*5000*10) div (5000*30) = 3333
        assert got == {"a": (30, 3333), "b": (10, 10000)}

    def test_already_balanced_needs_no_sampling(self, spark):
        docs = self._src_docs(
            spark,
            [(1, "a", " ".join(["w"] * 10)), (2, "b", " ".join(["w"] * 10))],
        )
        rates = {r.source: r.rate_e4
                 for r in T.mixture_rates(docs, {"a": 5000, "b": 5000}).collect()}
        assert rates == {"a": 10000, "b": 10000}

    def test_untargeted_sources_get_no_row(self, spark):
        docs = self._src_docs(
            spark,
            [(1, "a", "w w"), (2, "junk", "w w w w w w")],
        )
        out = T.mixture_rates(docs, {"a": 10000}).collect()
        assert [(r.source, r.rate_e4) for r in out] == [("a", 10000)]

    def test_composes_with_stratified_sample(self, spark):
        # end-to-end mixture pass: calibrate, collect the sources-sized
        # rate table (driver-side policy, like plan building), sample
        docs = self._src_docs(
            spark,
            [(i, "big" if i < 40 else "small", " ".join(["w"] * 10))
             for i in range(50)],
        )
        rates = {
            r.source: int(r.rate_e4)
            for r in T.mixture_rates(docs, {"big": 5000, "small": 5000}).collect()
        }
        assert rates["small"] == 10000 and rates["big"] < 10000
        out = T.stratified_sample(docs, rates)
        by_src = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
        # every 'small' doc survives; 'big' is thinned toward parity
        assert by_src["small"] == 10
        assert 0 < by_src["big"] < 40


class TestVocabDrift:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_identical_corpora_have_zero_distance(self, spark):
        a = self._docs(spark, [(1, "x y z x"), (2, "y z")])
        (r,) = T.vocab_drift(a, a, vocab_size=10).collect()
        assert r.tv_distance_e4 == 0
        assert r.n_words_a == r.n_words_b == 6

    def test_disjoint_corpora_have_max_distance(self, spark):
        a = self._docs(spark, [(1, "aa bb cc")])
        b = self._docs(spark, [(2, "xx yy zz")])
        (r,) = T.vocab_drift(a, b, vocab_size=10).collect()
        assert r.tv_distance_e4 == 10000
        assert r.n_vocab == 6

    def test_hand_computed_partial_drift(self, spark):
        # a: x3 y1; b: x1 y3 -> TV = (|3-1| + |1-3|) / (2*4) = 0.5
        a = self._docs(spark, [(1, "x x x y")])
        b = self._docs(spark, [(2, "x y y y")])
        (r,) = T.vocab_drift(a, b, vocab_size=10).collect()
        assert r.tv_distance_e4 == 5000

    def test_oov_bucket_counts_tail_mass(self, spark):
        # vocab_size=1: universe = {x} (top of both); remaining words
        # are each side's OOV bucket: a = x2,oov2; b = x2,oov2 -> TV 0
        a = self._docs(spark, [(1, "x x p q")])
        b = self._docs(spark, [(2, "x x r s")])
        (r,) = T.vocab_drift(a, b, vocab_size=1).collect()
        assert r.n_vocab == 1
        assert r.tv_distance_e4 == 0
