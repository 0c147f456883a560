"""Physical-plan assertions (.explain) — the 100 TB checklist: small
sides broadcast, aggregates map-side partial, filters and projections
pushed to the parquet scan, no stray shuffles in the map-only stage."""

import pytest
from pyspark.sql import functions as F

from gumbo_pp_spark.operators.dedup import exact_dedup, minhash_signatures
from gumbo_pp_spark.operators.extract import extract_main_text
from gumbo_pp_spark.operators.similarity import cosine_topk
from gumbo_pp_spark.suite import q_lineitem_agg, q_top_orders_per_segment

from .conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


class TestPlans:
    def test_cosine_topk_broadcasts_queries(self, spark):
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        out = cosine_topk(emb, emb.where(F.col("vec_id") % 100 == 0), k=3)
        plan = plan_of(out)
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        # the big side is never shuffled before the join
        assert plan.index("Broadcast") < len(plan)

    def test_exact_dedup_partial_agg(self, spark, docs):
        plan = plan_of(exact_dedup(docs))
        # two HashAggregates around one exchange = map-side combine
        assert plan.count("HashAggregate") >= 2
        assert "partial_min" in plan or "partial_count" in plan

    def test_minhash_signatures_map_only(self, spark, docs):
        # round-8: signatures are per-document array_min expressions —
        # no aggregate, and no exchange beyond the guarded input
        # spread (the round-7 explode→groupBy planned a SortAggregate
        # because min(string) cannot hash-aggregate)
        plan = plan_of(minhash_signatures(docs))
        assert "SortAggregate" not in plan
        assert "array_min" in plan
        # only the ensure_min_parallelism round-robin spread may
        # exchange; never a hash partitioning on doc_id
        assert "hashpartitioning(doc_id" not in plan

    def test_broadcast_dim_join(self, spark):
        plan = plan_of(q_top_orders_per_segment(spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan

    def test_filter_pushdown_to_scan(self, spark):
        plan = plan_of(q_lineitem_agg(spark, SF_SMOKE))
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan

    def test_extract_stage_is_map_only(self, spark):
        pages = spark.createDataFrame(
            [(1, "u", bytearray(b"<p>x</p>"))], "doc_id long, url string, html binary"
        )
        plan = plan_of(extract_main_text(pages))
        assert "Exchange" not in plan  # no shuffle anywhere in the stage

    def test_extract_readschema_pruned(self, spark, tmp_path, docs):
        from gumbo_pp_spark.sources.pages import synth_pages

        path = str(tmp_path / "p.parquet")
        synth_pages(spark, SF_SMOKE).write.parquet(path)
        out = extract_main_text(spark.read.parquet(path))
        line = [ln for ln in plan_of(out).splitlines() if "ReadSchema" in ln][0]
        assert "html" in line and "text" not in line and "lang" not in line

    def test_cap_per_host_first_window_salted(self, spark, docs):
        # skew safety: phase-1 window must partition on (host, salt),
        # never on host alone, so a crawl-heavy host spreads over
        # salt_buckets bounded tasks before the exact phase-2 re-rank
        from gumbo_pp_spark.operators.textstats import cap_per_host

        d = docs.selectExpr("doc_id", "source || '.example.com' AS host")
        plan = plan_of(cap_per_host(d, cap=3, salt_buckets=16))
        import re

        windows = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", plan)
        assert len(windows) >= 2, plan
        # executed bottom-up: the LAST Window in the plan string is
        # phase 1 — it must carry two partition keys (host + salt)
        assert "pmod" in plan and "xxhash64" in plan
        salted = [w for w in windows if "pmod" in w or "_w" in w]
        assert salted, windows

    def test_minhash_lsh_single_candidate_shuffle(self, spark, docs):
        # round-3 plan fix: candidate generation is ONE groupBy
        # (collect_list per bucket) — no band self-join, no separate
        # cap groupBy+join; the only joins left are the two signature
        # re-joins for the n_eq verification
        from gumbo_pp_spark.operators.dedup import minhash_lsh_pairs

        plan = plan_of(minhash_lsh_pairs(docs.selectExpr("doc_id", "text")))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
        # exactly 2 joins (sa + sb); the round-2 shape had 4
        import re

        n_joins = len(re.findall(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin)", plan))
        assert n_joins == 2, f"expected 2 joins, saw {n_joins}"
        # the plan shape is invariant in (n_hashes, n_bands): the
        # production-realism 32/8 config (r7) keeps one candidate
        # shuffle + the two signature re-joins
        plan32 = plan_of(
            minhash_lsh_pairs(
                docs.selectExpr("doc_id", "text"),
                min_equal=16, n_hashes=32, n_bands=8,
            )
        )
        n_joins32 = len(re.findall(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin)", plan32))
        assert n_joins32 == 2, f"expected 2 joins, saw {n_joins32}"

    def test_simhash_pairs_single_signature_computation(self, spark, docs):
        # round-4 plan fix: the 63-bit simhash aggregate is computed
        # exactly once (cached signature DF + one array-explode band
        # table) — both sides of the (band, bkey) self-join read the
        # in-memory relation.  The round-3 shape built the band tables
        # as a 3-way unionAll over the UNCACHED signature DF, twice,
        # recomputing the per-word md5 aggregate up to 6×.
        from gumbo_pp_spark.operators.dedup import simhash_pairs

        plan = plan_of(simhash_pairs(docs.selectExpr("doc_id", "text")))
        import re

        assert plan.count("InMemoryTableScan") == 2, plan
        n_joins = len(
            re.findall(
                r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin)",
                plan,
            )
        )
        assert n_joins == 1, f"expected 1 self-join, saw {n_joins}"
        # no live (non-cached) aggregate of the simhash expression:
        # every HashAggregate mentioning md5 must sit inside an
        # InMemoryRelation printout, not in the executed top-level plan
        top = plan.split("InMemoryRelation", 1)[0]
        assert "md5" not in top, top


class TestInputSplitTuning:
    def test_level_aware_splits_give_task_waves(self, spark, tmp_path):
        """round-6: tune_input_splits sizes maxPartitionBytes off the
        input's ON-DISK bytes so the scan yields >= ~waves x cores
        splits (a fixed byte size leaves high-parallelism sessions a
        single straggler-bound task wave)."""
        from gumbo_pp_spark.plans.partitioning import input_stats, tune_input_splits

        src = str(tmp_path / "pages")
        # many small files, like the bench corpus layout
        spark.range(20_000).selectExpr(
            "id", "repeat('x', 200) as pad"
        ).repartition(64).write.parquet(src)

        total, n_files = input_stats(spark, src)
        assert n_files >= 64 and total > 0

        old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        old_open = spark.conf.get("spark.sql.files.openCostInBytes")
        try:
            cores = spark.sparkContext.defaultParallelism
            chosen = tune_input_splits(spark, src, waves=3)
            assert int(spark.conf.get("spark.sql.files.maxPartitionBytes")) == chosen
            n_splits = spark.read.parquet(src).rdd.getNumPartitions()
            # enough splits for straggler amortization (capped by the
            # file count when files cannot be subdivided)
            target = min(64, 2 * cores)
            assert n_splits >= target, (n_splits, target, chosen)
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
            spark.conf.set("spark.sql.files.openCostInBytes", old_open)

    def test_huge_input_hits_clamp(self, spark, tmp_path, monkeypatch):
        """At TB scale the computed split size hits max_split_bytes —
        the tuner never shrinks splits below the clamp floor either."""
        from gumbo_pp_spark.plans import partitioning as P

        monkeypatch.setattr(P, "input_stats", lambda s, d: (100 << 40, 1_000_000))
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            chosen = P.tune_input_splits(spark, "ignored", waves=3)
            assert chosen == 128 << 20
            tiny = P.tune_input_splits(spark, "ignored", waves=3,
                                       max_split_bytes=64 << 20)
            assert tiny == 64 << 20
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    def test_ensure_min_parallelism_guard(self, spark, tmp_path):
        """round-6 late: a single-row-group scan (fewer partitions than
        cores) is round-robin spread to waves x cores; an
        already-parallel input passes through IDENTICAL (no Exchange
        added — the corpus-scale no-op contract)."""
        from gumbo_pp_spark.plans import partitioning as P

        src = str(tmp_path / "one_rg")
        spark.range(5000).selectExpr("id", "repeat('w ', 40) as text") \
            .coalesce(1).write.parquet(src)
        one = spark.read.parquet(src)
        assert one.rdd.getNumPartitions() == 1
        cores = spark.sparkContext.defaultParallelism
        spread = P.ensure_min_parallelism(one)
        assert spread.rdd.getNumPartitions() == 2 * cores
        assert spread.count() == 5000

        wide = one.repartition(cores)
        assert P.ensure_min_parallelism(wide) is wide  # untouched


def test_revenue_by_nation_broadcasts_all_dims(spark):
    # TPC-H Q5 analogue: every dimension side must broadcast; the only
    # wide exchanges are the final groupBy (and AQE bookkeeping) — the
    # lineitem fact table is never shuffled for a dim join
    from gumbo_pp_spark.suite import q_revenue_by_nation

    plan = plan_of(q_revenue_by_nation(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert "SortMergeJoin" not in plan


class TestSessionFourPlans:
    """Session-4 operators: the 100 TB plan shapes hold."""

    def test_gopher_rules_is_map_only(self, spark, docs):
        from gumbo_pp_spark.operators.textstats import gopher_rules

        plan = plan_of(gopher_rules(docs))
        assert "Exchange" not in plan
        assert "Python" not in plan  # whole-stage codegen, no UDF

    def test_mixture_rates_map_side_combined(self, spark, docs):
        from gumbo_pp_spark.operators.textstats import mixture_rates

        plan = plan_of(mixture_rates(docs, {"src0": 5000, "src1": 5000}))
        # token count per source: partial agg before the exchange, and
        # the 1-row binding constants arrive broadcast
        assert "partial_sum" in plan
        assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan

    def test_select_token_budget_has_no_global_sort(self, spark, docs):
        from gumbo_pp_spark.operators.packing import select_token_budget
        from gumbo_pp_spark.operators.textstats import lm_coverage

        scored = docs.join(
            lm_coverage(docs, lm_size=16).select(
                "doc_id", F.col("coverage_e4").alias("score")
            ),
            "doc_id",
        )
        plan = plan_of(select_token_budget(scored, 5000, "score"))
        # the corpus is never range-partitioned for a global sort; the
        # only single-partition work is the scores-sized histogram
        assert "rangepartitioning" not in plan
        assert "partial_sum" in plan  # histogram is map-side combined

    def test_pack_sequences_window_never_spans_a_shard(self, spark, docs):
        # VERDICT r7 #1: the running-sum window over full corpus rows
        # must partition on (shard, blk) — never on shard alone, which
        # made one window partition hold corpus/n_shards rows.  The
        # only shard-partitioned window allowed is the block-offset
        # roll-up, which sits ABOVE the (shard, blk) aggregate and is
        # block-table-sized.
        from gumbo_pp_spark.operators.packing import pack_sequences

        plan = plan_of(pack_sequences(docs))
        final = plan.split("== Initial Plan ==")[0]
        import re

        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", final)
        assert specs, "expected window operators in the plan"
        # the corpus-row window orders by doc_id — it must carry blk
        # in its partition keys; the doc_id-free window is the
        # block-offset roll-up over the aggregated block table only
        doc_windows = [s for s in specs if "doc_id" in s]
        assert doc_windows, "expected the within-block cumsum window"
        assert all("blk" in s for s in doc_windows), doc_windows

    def test_select_token_budget_boundary_window_block_split(self, spark, docs):
        # VERDICT r7 #2: the boundary-score cumulative window must
        # partition on (score, blk) so a dominant boundary score never
        # concentrates one window partition.  Fixture: >50% of rows
        # share the boundary score.
        from gumbo_pp_spark.operators.packing import select_token_budget

        scored = docs.selectExpr(
            "doc_id", "text",
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 100 "
            "ELSE doc_id % 7 END AS BIGINT) AS score",
        )
        out = select_token_budget(scored, 500, "score", block_size=5)
        plan = plan_of(out)
        final = plan.split("== Initial Plan ==")[0]
        import re

        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", final)
        doc_windows = [s for s in specs if "doc_id" in s]
        assert doc_windows, "expected the within-block cumsum window"
        assert all("blk" in s for s in doc_windows), doc_windows
        # and the dominant-score fixture still yields the exact greedy
        # prefix (budget 500 → a strict subset of the boundary score)
        rows = out.collect()
        assert 0 < len(rows) < 500

    def test_lm_coverage_corpus_never_shuffled_on_bigram(self, spark, docs):
        from gumbo_pp_spark.operators.textstats import lm_coverage

        plan = plan_of(lm_coverage(docs, lm_size=16))
        final = plan.split("== Initial Plan ==")[0]
        # model side broadcast; the only hash exchanges are the model
        # build and the doc-keyed agg — never a bigram-keyed corpus one
        assert "BroadcastHashJoin" in final
        assert final.count("hashpartitioning(bigram") <= 1
