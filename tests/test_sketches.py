"""Count-Min sketch: one-sided error, constant sketch size, plan shape."""

from pyspark.sql import functions as F

from gumbo_pp_spark.operators import sketches as SK


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestCmsSketch:
    def test_sketch_size_independent_of_corpus(self, spark):
        small = _docs(spark, [(i, "a b c") for i in range(5)])
        big = _docs(spark, [(i, "a b c d e f g h") for i in range(500)])
        ns = SK.cms_sketch(small, width=8, depth=2).count()
        nb = SK.cms_sketch(big, width=8, depth=2).count()
        assert ns <= 16 and nb <= 16

    def test_row_totals_equal_token_count(self, spark):
        docs = _docs(spark, [(i, "a b c d e") for i in range(40)])
        per_row = (
            SK.cms_sketch(docs, width=4, depth=3)
            .groupBy("row").agg(F.sum("cnt").alias("s")).collect()
        )
        assert sorted(r["s"] for r in per_row) == [200, 200, 200]

    def test_estimate_one_sided_and_exact_when_wide(self, spark):
        # narrow sketch: est >= true for every word; wide sketch with a
        # tiny vocab: no collisions -> est == true
        docs = _docs(
            spark,
            [(i, "hot hot hot cold") for i in range(30)]
            + [(100 + i, f"rare{i}") for i in range(10)],
        )
        true = {
            r["word"]: r["n"]
            for r in docs.select(F.explode(F.split("text", " ")).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        narrow = {
            r["word"]: r["est"]
            for r in SK.cms_heavy_hitters(docs, width=2, depth=2, min_count=0).collect()
        }
        assert set(narrow) == set(true)
        assert all(narrow[w] >= true[w] for w in true)
        wide = {
            r["word"]: r["est"]
            for r in SK.cms_heavy_hitters(docs, width=4096, depth=3, min_count=0).collect()
        }
        assert wide == true

    def test_no_heavy_hitter_missed(self, spark):
        docs = _docs(spark, [(i, "alpha beta " + f"tail{i}") for i in range(50)])
        hh = {r["word"] for r in SK.cms_heavy_hitters(docs, width=4, depth=2, min_count=50).collect()}
        assert {"alpha", "beta"} <= hh  # est >= true == 50

    def test_estimation_join_is_broadcast(self, spark):
        docs = _docs(spark, [(i, "a b c") for i in range(20)])
        plan = (
            SK.cms_heavy_hitters(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


class TestKmvDistinct:
    def test_exact_when_k_covers_vocab(self, spark):
        # k >= |vocab|: kth_hash is the max of ALL hashes and k_used is
        # the exact distinct count
        docs = _docs(spark, [(i, "a b c d e a b") for i in range(30)])
        r = SK.kmv_distinct(docs, k=100).first()
        assert r["k_used"] == 5

    def test_estimate_reasonable_and_deterministic(self, spark):
        docs = _docs(spark, [(i, " ".join(f"w{j}" for j in range(i % 40, i % 40 + 60)))
                              for i in range(100)])
        # vocab = w0..w98 -> 99 distinct
        a = SK.kmv_distinct(docs, k=24).first()
        b = SK.kmv_distinct(docs, k=24).first()
        assert a == b
        assert a["k_used"] == 24
        # KMV with k=24 on 99 distinct: within a loose 3x band
        assert 33 <= a["est_distinct"] <= 300, a

    def test_estimator_formula(self, spark):
        import hashlib

        docs = _docs(spark, [(0, "x y z q r s t u v w")])
        r = SK.kmv_distinct(docs, k=4).first()
        hs = sorted(int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                    for w in "x y z q r s t u v w".split())
        assert r["kth_hash"] == hs[3]
        assert r["est_distinct"] == (4 - 1) * (1 << 32) // hs[3]

    def test_bottomk_is_partial_topk_not_global_sort(self, spark):
        docs = _docs(spark, [(i, "a b c") for i in range(10)])
        plan = SK.kmv_distinct(docs)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Sort [h" not in plan  # no full sort stage


class TestLengthQuantiles:
    def test_matches_numpy_type1(self, spark):
        import numpy as np

        texts = [(i, " ".join("w" for _ in range(1 + (i * 7) % 50))) for i in range(200)]
        docs = _docs(spark, texts)
        got = {r["p_e2"]: r["value"]
               for r in SK.length_quantiles(docs).collect()}
        lens = np.sort([len(t.split(" ")) for _, t in texts])
        n = len(lens)
        for p in (25, 50, 75, 90, 99):
            # smallest value covering >= p% of docs (type-1)
            import math

            k = math.ceil(p * n / 100)
            assert got[p] == lens[k - 1], p

    def test_constant_lengths(self, spark):
        docs = _docs(spark, [(i, "a b c") for i in range(10)])
        got = {r["p_e2"]: r["value"] for r in SK.length_quantiles(docs).collect()}
        assert set(got.values()) == {3}

    def test_corpus_stage_is_partial_agg(self, spark):
        docs = _docs(spark, [(i, "a b") for i in range(10)])
        plan = SK.length_quantiles(docs)._jdf.queryExecution().executedPlan().toString()
        # the corpus-sized stage must partial-aggregate before its
        # exchange; downstream windows run on the collapsed histogram
        assert "partial_count" in plan or "HashAggregate" in plan
        assert "CartesianProduct" not in plan


class TestGroupedQuantiles:
    def test_per_group_values_match_numpy(self, spark):
        import numpy as np

        rows = []
        for g, lens in (("a", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
                        ("b", [5, 5, 5, 20])):
            for i, n in enumerate(lens):
                rows.append((len(rows), g, " ".join(["w"] * n)))
        docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
        got = {(r.grp, r.p_e2): r.value
               for r in SK.grouped_length_quantiles(
                   docs, probs_e2=(50, 90, 100)).collect()}
        # type-1 quantile: smallest len whose cumulative count covers p%
        for g, lens in (("a", list(range(1, 11))), ("b", [5, 5, 5, 20])):
            arr = np.sort(np.array(lens))
            n = len(arr)
            for p in (50, 90, 100):
                import math
                k = math.ceil(p * n / 100)
                assert got[(g, p)] == arr[k - 1], (g, p)

    def test_groups_do_not_leak_into_each_other(self, spark):
        docs = spark.createDataFrame(
            [(1, "x", "w"), (2, "y", " ".join(["w"] * 100))],
            "doc_id bigint, source string, text string",
        )
        got = {(r.grp, r.p_e2): r.value
               for r in SK.grouped_length_quantiles(docs, probs_e2=(99,)).collect()}
        assert got == {("x", 99): 1, ("y", 99): 100}
