"""Physical-plan quality gates: the properties that make these queries
survive a 100x scale-up. A correctness-preserving change that loses
pushdown, broadcasts, partial aggregation, or adds a shuffle fails here.

(Reference delegates these to DuckDB — research.md:588-634; in the rebuild
they are Catalyst behaviors we must not regress.)"""

from __future__ import annotations

import re

import pytest

from mongodb_cdc_delta_spark.queries import all_queries

SF = "/root/testdata/sf0.001"
REG = all_queries()


def plan_of(spark, name: str, execute: bool = False) -> str:
    df = REG[name].fn(spark, SF)
    if execute:
        # AQE finalizes (and codegen-annotates) the plan only on execution,
        # and only the df's own QueryExecution reflects it (a sink write
        # spawns a separate execution)
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def count(pattern: str, plan: str) -> int:
    return len(re.findall(pattern, plan))


class TestPushdown:
    def test_point_lookup_filter_reaches_scan(self, spark):
        plan = plan_of(spark, "point_lookup")
        assert "PushedFilters: [IsNotNull(event_id), EqualTo(event_id," in plan

    def test_range_scan_bounds_pushed(self, spark):
        plan = plan_of(spark, "range_scan")
        assert "GreaterThanOrEqual" in plan or "GreaterThan" in plan
        assert "LessThanOrEqual" in plan or "LessThan" in plan
        assert "PushedFilters: []" not in plan.split("FileScan")[1][:400]

    def test_projection_pruned_to_read_schema(self, spark):
        # group_topk reads orders for a single column — the scan schema
        # must contain only that column, not the whole table
        plan = plan_of(spark, "group_topk")
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1) == "o_custkey:bigint"


class TestJoins:
    def test_star_join_broadcasts_all_dims(self, spark):
        plan = plan_of(spark, "star_join_revenue")
        assert count(r"BroadcastHashJoin", plan) >= 4
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_fk_join_no_cartesian(self, spark):
        plan = plan_of(spark, "fk_join_agg")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_semi_join_stays_semi(self, spark):
        # EXISTS must compile to a semi join (no row duplication), never a
        # full join + dedup
        plan = plan_of(spark, "semi_join")
        assert "LeftSemi" in plan


class TestAggregation:
    def test_group_agg_partial_mapside(self, spark):
        plan = plan_of(spark, "group_agg")
        assert "partial_" in plan  # map-side combine before the shuffle
        assert count(r"Exchange hashpartitioning", plan) == 1

    def test_pricing_summary_single_shuffle(self, spark):
        plan = plan_of(spark, "pricing_summary")
        assert count(r"Exchange", plan) == 1
        assert "partial_" in plan

    def test_topk_uses_take_ordered_not_global_sort(self, spark):
        plan = plan_of(spark, "group_topk")
        assert "TakeOrderedAndProject" in plan
        assert count(r"\bSort\b", plan) == 0

    def test_knn_topk_no_shuffle(self, spark):
        # scan → project → TakeOrdered: brute-force knn needs zero shuffles
        plan = plan_of(spark, "knn_cosine_topk")
        assert "TakeOrderedAndProject" in plan
        assert count(r"Exchange hashpartitioning", plan) == 0


class TestWindows:
    def test_running_sum_single_shuffle(self, spark):
        plan = plan_of(spark, "window_running_sum")
        assert count(r"Exchange hashpartitioning", plan) == 1

    def test_session_window_single_shuffle(self, spark):
        plan = plan_of(spark, "session_window_native")
        assert count(r"Exchange hashpartitioning", plan) <= 1


class TestCodegen:
    @pytest.mark.parametrize(
        "name", ["pricing_summary", "group_agg", "range_scan", "sessionize"]
    )
    def test_hot_path_is_whole_stage_codegen(self, spark, name):
        plan = plan_of(spark, name, execute=True)
        # '*(n)' prefixes mark whole-stage-codegen spans
        assert count(r"\*\(\d+\)", plan) >= 1, f"{name} fell out of codegen"


class TestTpchBreadthPlans:
    def test_volume_shipping_broadcasts_dims_no_cartesian(self, spark):
        plan = plan_of(spark, "volume_shipping", execute=True)
        assert count(r"BroadcastHashJoin", plan) >= 2  # both nation dims
        assert "CartesianProduct" not in plan
        # shipdate window reaches the lineitem scan
        assert "PushedFilters" in plan and "l_shipdate" in plan

    def test_min_cost_supplier_decorrelates(self, spark):
        # the correlated min subquery must become one aggregate + join,
        # not a per-row rescan (no nested loop over lineitem)
        plan = plan_of(spark, "min_cost_supplier", execute=True)
        assert "CartesianProduct" not in plan
        # AQE prints "final +- == Initial Plan ==" — count only the final
        final = plan.split("== Initial Plan ==")[0]
        assert count(r"FileScan parquet", final) <= 4  # part, 2x lineitem, supplier
        # p_size filter pushed down
        assert "EqualTo(p_size,15)" in plan.replace(" ", "") or "p_size" in plan

    def test_dormant_customers_anti_join(self, spark):
        plan = plan_of(spark, "dormant_customers", execute=True)
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan

    def test_sampling_predicates_stay_in_scan_stage(self, spark):
        # deterministic sampling is a pure filter: no Exchange at all
        plan = plan_of(spark, "deterministic_sample", execute=True)
        assert "Exchange" not in plan

    def test_customer_order_distribution_outer_join_survives(self, spark):
        # the priority filter sits in the join condition; the optimizer
        # must keep the join LEFT (count-0 bucket) and never cartesian
        plan = plan_of(spark, "customer_order_distribution", execute=True)
        assert "LeftOuter" in plan
        assert "CartesianProduct" not in plan

    def test_small_qty_part_revenue_decorrelates(self, spark):
        # per-part avg subquery → one aggregate + join, no per-row rescan
        plan = plan_of(spark, "small_qty_part_revenue", execute=True)
        assert "CartesianProduct" not in plan
        final = plan.split("== Initial Plan ==")[0]
        assert count(r"FileScan parquet", final) <= 3  # part, 2x lineitem
        assert "partial_avg" in plan or "avg" in plan

    def test_waiting_suppliers_semi_and_anti(self, spark):
        # EXISTS → LeftSemi, NOT EXISTS → LeftAnti, no nested-loop blowup
        plan = plan_of(spark, "waiting_suppliers", execute=True)
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan
        # the semi/anti sides are LINEITEM (fact-fact): they must SHUFFLE,
        # never broadcast — a broadcast there OOMs any driver whose memory
        # is smaller than the fact table (found live at sf0.1 on a
        # default-memory session; MERGE hints pin the safe strategy)
        assert count(r"SortMergeJoin.*LeftSemi", plan) >= 1
        assert count(r"SortMergeJoin.*LeftAnti", plan) >= 1

    def test_promo_part_suppliers_chained_semi_joins(self, spark):
        plan = plan_of(spark, "promo_part_suppliers", execute=True)
        assert count(r"LeftSemi", plan) >= 2  # part→lineitem, heavy→supplier
        assert "CartesianProduct" not in plan
        # the shipdate window reaches the lineitem scan
        assert "l_shipdate" in plan and "PushedFilters" in plan

    def test_regional_revenue_broadcasts_nation_region(self, spark):
        plan = plan_of(spark, "regional_revenue", execute=True)
        assert count(r"BroadcastHashJoin", plan) >= 2  # nation + region
        assert "CartesianProduct" not in plan
        # orderdate window pushes into the orders scan
        assert "o_orderdate" in plan and "PushedFilters" in plan

    def test_market_share_single_pass_conditional_agg(self, spark):
        # share = conditional sum / total sum must be ONE aggregation over
        # the joined base, not two scans of it
        plan = plan_of(spark, "market_share", execute=True)
        assert "CartesianProduct" not in plan
        final = plan.split("== Initial Plan ==")[0]
        # part, lineitem, supplier, orders, customer, nation x2, region = 8
        assert count(r"FileScan parquet", final) <= 8
        assert count(r"BroadcastHashJoin", final) >= 4

    def test_product_profit_part_filter_pushed(self, spark):
        plan = plan_of(spark, "product_profit", execute=True)
        assert "CartesianProduct" not in plan
        # LIKE %red% pushes as a string-contains filter on the part scan
        assert "p_name" in plan and "PushedFilters" in plan

    def test_top_supplier_revenue_reuses_rev_aggregate(self, spark):
        # the rev CTE feeds both the join and the max: Spark should reuse
        # the exchange rather than recompute lineitem twice — accept either
        # ReusedExchange or <=2 lineitem scans, never a cartesian
        plan = plan_of(spark, "top_supplier_revenue", execute=True)
        assert "CartesianProduct" not in plan
        final = plan.split("== Initial Plan ==")[0]
        assert (
            "ReusedExchange" in final
            or count(r"FileScan parquet [^\n]*lineitem", final) <= 2
        )

    def test_part_supplier_counts_two_stage_distinct(self, spark):
        # count(DISTINCT) compiles to expand + two-stage agg, no
        # per-group collect_set materialization
        plan = plan_of(spark, "part_supplier_counts", execute=True)
        assert "CartesianProduct" not in plan
        assert "Expand" in plan or "distinct" in plan


class TestLlmOpsPlans:
    def test_doc_chunking_zero_shuffle(self, spark):
        # sequence+explode+slice is partition-local: no Exchange at all
        plan = plan_of(spark, "doc_chunking", execute=True)
        assert "Exchange" not in plan

    def test_semantic_cluster_assign_zero_shuffle(self, spark):
        # centroids are plan literals → per-row argmax, single scan
        plan = plan_of(spark, "semantic_cluster_assign", execute=True)
        assert "Exchange" not in plan
        assert count(r"FileScan parquet", plan.split("== Initial Plan ==")[0]) == 1

    def test_int8_knn_no_shuffle_take_ordered(self, spark):
        # same shape as fp32 knn (scan + project + TakeOrderedAndProject)
        # plus ONE deliberate round-robin spread() of the single-file scan
        # (r10: the quantize + integer-dot HOF folds are the per-row cost;
        # A/B 0.46x) — but never a key-partitioned shuffle of the rows
        plan = plan_of(spark, "knn_cosine_topk_int8", execute=True)
        assert "TakeOrderedAndProject" in plan
        assert count(r"Exchange", plan.split("== Initial Plan ==")[0]) == 1
        assert "RoundRobinPartitioning" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Exchange rangepartitioning" not in plan

    def test_unigram_score_broadcasts_vocab(self, spark):
        # the token→vocab join must broadcast the aggregated vocab, never
        # shuffle the exploded token stream for a sort-merge join
        plan = plan_of(spark, "unigram_logprob_score", execute=True)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_repetition_signals_partial_aggregation(self, spark):
        # bigram counting must map-side combine before the shuffle
        plan = plan_of(spark, "repetition_signals", execute=True)
        assert "partial" in plan.lower()
        assert "CartesianProduct" not in plan

    def test_exact_substring_decontaminate_broadcasts_eval(self, spark):
        # the eval gram-hash set must broadcast; the training gram stream
        # (the 100 TB side) must never be sort-merge shuffled against it
        plan = plan_of(spark, "decontaminate_exact_substring", execute=True)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_containment_decontaminate_broadcasts_eval(self, spark):
        # eval shingle hashes AND per-eval-doc sizes broadcast; the
        # training shingle stream (the 100 TB side) must never be
        # sort-merge shuffled, and the top-50 must be TakeOrdered
        plan = plan_of(spark, "decontaminate_containment", execute=True)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "TakeOrderedAndProject" in plan

    def test_winnowing_fingerprints_computed_once(self, spark):
        # the winnowing pass feeds 3 branches (hot filter + self-join
        # sides); the checkpoint must collapse them to ONE scan of the
        # documents table — 3 scans would triple the dominant stage
        df = REG["dedup_winnowing_pairs"].fn(spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert count(r"Scan parquet", plan) <= 1
        assert "CartesianProduct" not in plan

    def test_linear_classifier_single_aggregation_pass(self, spark):
        # r10: the per-doc score is a zero-shuffle ARRAY aggregate over the
        # token array (one projection, no explode + groupBy pass at all) —
        # the plan must stay exchange-free with a single corpus scan
        plan = plan_of(spark, "quality_linear_classifier", execute=True)
        assert "Exchange" not in plan.split("== Initial Plan ==")[0]
        assert count(r"FileScan parquet", plan.split("== Initial Plan ==")[0]) == 1
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan

    def test_shard_shuffle_single_exchange(self, spark):
        # one hash exchange (the shard partition) + the window sort; no
        # global ordering anywhere. (Unexecuted plan: the executed string
        # prints the exchange twice, once per AQE Final/Initial section.)
        plan = plan_of(spark, "corpus_shard_shuffle")
        assert count(r"Exchange hashpartitioning", plan) == 1
        assert count(r"Exchange rangepartitioning", plan) == 0

    def test_funnel_no_cartesian_and_partial_agg(self, spark):
        plan = plan_of(spark, "funnel_conversion", execute=True)
        assert "CartesianProduct" not in plan
        assert "partial" in plan.lower()

    def test_retention_dedups_before_cohort_join(self, spark):
        # (user, day) distinct must aggregate BEFORE joining cohorts —
        # the join touches user-day granularity, not raw events
        plan = plan_of(spark, "retention_cohorts", execute=True)
        assert "CartesianProduct" not in plan
        assert count(r"HashAggregate", plan) >= 3

    def test_bloom_prefilter_is_scan_local(self, spark):
        # the training side must be filtered by bit tests against the
        # broadcast bitmap — never joined/shuffled against eval hashes
        plan = plan_of(spark, "decontaminate_bloom_prefilter", execute=True)
        assert "SortMergeJoin" not in plan
        assert count(r"Exchange hashpartitioning", plan.split("== Initial Plan ==")[0]) <= 1  # only the final doc_id agg

    def test_cms_counters_broadcast(self, spark):
        plan = plan_of(spark, "cms_token_counts", execute=True)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_hll_register_table_is_bounded_agg(self, spark):
        plan = plan_of(spark, "hll_distinct_tokens", execute=True)
        assert "partial" in plan.lower()  # register max is map-side combined
        assert "CartesianProduct" not in plan

    def test_semantic_dedup_prune_cluster_bounded(self, spark):
        # the pair join's equi-key is centroid_id (cluster-bounded — never
        # an all-pairs cartesian); final keep-flag join stays a hash join
        plan = plan_of(spark, "semantic_dedup_prune", execute=True)
        assert "CartesianProduct" not in plan
        assert "centroid_id" in plan

    def test_doc_pii_scrub_zero_shuffle(self, spark):
        # regex count+redact chain is a pure per-row projection: one scan,
        # no Exchange anywhere
        plan = plan_of(spark, "doc_pii_scrub", execute=True)
        assert "Exchange" not in plan
        assert count(r"FileScan parquet", plan) == 1

    def test_phash_pairs_blocked_join(self, spark):
        # candidate generation joins on (block_idx, block_val) — bucketed
        # pigeonhole LSH, never an all-pairs product of fingerprints
        plan = plan_of(spark, "multimodal_phash_pairs", execute=True)
        assert "CartesianProduct" not in plan
        assert "block_val" in plan

    def test_weighted_reservoir_is_take_ordered(self, spark):
        # A-ES sampling must be scan + TakeOrdered: per-partition top-k
        # merged on the driver, never a global sort or shuffle
        plan = plan_of(spark, "weighted_reservoir_sample", execute=True)
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan

    def test_hard_negatives_broadcast_batch(self, spark):
        # the non-equi (label <>) join must broadcast the bounded query
        # batch, never cartesian-product two corpus-sized sides
        plan = plan_of(spark, "hard_negative_mining", execute=True)
        assert "BroadcastNestedLoopJoin" in plan
        assert "CartesianProduct" not in plan

    def test_value_histogram_range_broadcast(self, spark):
        # the min/max range is a one-row broadcast; bucketing is a pure
        # projection — no cartesian of data-sized sides, counts are the
        # only hash shuffle (plus the scalar aggregate's single-partition
        # exchange)
        plan = plan_of(spark, "value_histogram", execute=True)
        assert "CartesianProduct" not in plan
        assert count(r"Exchange hashpartitioning", plan.split("== Initial Plan ==")[0]) <= 1

    def test_trigram_mining_two_shuffles(self, spark):
        # lead windows share the user_id partitioning; the n-gram count
        # adds one more hash shuffle; top-k is TakeOrdered (no sort)
        plan = plan_of(spark, "top_event_trigrams", execute=True)
        assert "TakeOrderedAndProject" in plan
        assert count(r"Exchange hashpartitioning", plan.split("== Initial Plan ==")[0]) <= 2


def _global_window_sites(plan: str) -> list[str]:
    """Return Window nodes that sort their input into ONE partition.

    In the physical-plan tree a global window prints as
        Window [...]
        +- Sort [...]
           +- Exchange SinglePartition ...
    Scalar aggregates legitimately use Exchange SinglePartition (one row),
    so we flag SinglePartition only when a Window node sits directly above.
    """
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow(Group)?\b", ln):
            for j in range(i + 1, min(i + 4, len(lines))):
                if "SinglePartition" in lines[j]:
                    bad.append(ln.strip())
                    break
                if re.search(r"\bWindow\b|\bHashAggregate\b|\bJoin\b", lines[j]):
                    break
    return bad


class TestNoGlobalWindows:
    """The one scale-killer pattern: a window over the whole dataset in a
    single partition. Round 3 shipped four of these; each was replaced by
    TakeOrdered (orderBy+limit) or percentile-threshold banding. These
    gates make the pattern unable to return silently."""

    @pytest.mark.parametrize(
        "name",
        [
            "bigram_logprob_score",
            "cms_token_counts",
            "curriculum_order",
            "customer_rfm_segments",
            "unigram_logprob_score",
        ],
    )
    def test_no_single_partition_window(self, spark, name):
        plan = plan_of(spark, name, execute=True)
        sites = _global_window_sites(plan)
        assert not sites, (
            f"{name}: global single-partition window(s) in plan: {sites}"
        )

    @pytest.mark.parametrize(
        "name", ["bigram_logprob_score", "cms_token_counts"]
    )
    def test_topk_caps_compile_to_take_ordered(self, spark, name):
        plan = plan_of(spark, name, execute=True)
        assert "TakeOrderedAndProject" in plan


class TestSuffixRunsPlan:
    def test_suffix_runs_broadcasts_eval_no_cartesian(self, spark):
        # eval gram table broadcasts; the training gram stream (the
        # 100 TB side) is never sort-merge shuffled or cartesian'd, and
        # the island windows partition by granular (doc, eval, diag) keys
        plan = plan_of(spark, "decontaminate_suffix_runs", execute=True)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)

    def test_cut_spans_no_cartesian_no_global_window(self, spark):
        plan = plan_of(spark, "decontaminate_cut_spans", execute=True)
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)


class TestAttributionPlans:
    def test_linear_attribution_user_keyed_band_join(self, spark):
        # the lookback join must key on user_id (hash/broadcast) with the
        # time band as a join-condition filter — never a cartesian of
        # purchases x channels
        plan = plan_of(spark, "purchase_attribution_linear", execute=True)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert not _global_window_sites(plan)

    def test_time_decay_attribution_user_keyed_band_join(self, spark):
        plan = plan_of(
            spark, "purchase_attribution_time_decay", execute=True
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert not _global_window_sites(plan)

    def test_last_touch_single_user_shuffle(self, spark):
        plan = plan_of(spark, "purchase_attribution_last_touch", execute=True)
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)

    def test_session_first_touch_shares_user_partitioning(self, spark):
        # sessionization + entry + credit: all windows partition by user
        # (or user, session) — one user-keyed shuffle, no global sort
        plan = plan_of(spark, "session_first_touch_attribution", execute=True)
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)
        final = plan.split("== Initial Plan ==")[0]
        assert count(r"Exchange hashpartitioning", final) <= 2


class TestRound5LateOpsPlans:
    """Plan gates for the round-5 late operators (trigram backoff LM,
    Gopher flags, matryoshka recall, MinHash calibration, tokenizer
    fertility)."""

    def test_trigram_backoff_all_model_joins_broadcast(self, spark):
        # three capped model tables + two unigram lookups: every scoring
        # join must broadcast; the trigram stream (the 100 TB side) must
        # never be sort-merge shuffled, and the caps must be TakeOrdered
        plan = plan_of(spark, "trigram_backoff_score", execute=True)
        assert count(r"BroadcastHashJoin", plan) >= 5
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "TakeOrderedAndProject" in plan
        assert not _global_window_sites(plan)

    def test_gopher_flags_zero_shuffle(self, spark):
        # five signals from higher-order array functions: one scan, no
        # Exchange at all
        plan = plan_of(spark, "gopher_quality_flags", execute=True)
        assert "Exchange" not in plan

    def test_fertility_single_partial_aggregate(self, spark):
        # per-lang rollup: map-side combine before the one shuffle
        plan = plan_of(spark, "tokenizer_fertility_by_lang", execute=True)
        assert "partial" in plan.lower()
        final = plan.split("== Initial Plan ==")[0]
        assert count(r"Exchange hashpartitioning", final) == 1

    def test_matryoshka_windows_are_group_limited(self, spark):
        # the per-(dim,query) top-10 must compile to WindowGroupLimit
        # Partial/Final (map-side partial top-k before the shuffle) —
        # never a global window, never a sort-merge join
        plan = plan_of(spark, "matryoshka_recall_report", execute=True)
        assert "WindowGroupLimit" in plan
        assert "SortMergeJoin" not in plan
        assert not _global_window_sites(plan)

    def test_minhash_error_no_cartesian_pair_keyed_smj_ok(self, spark):
        # candidate generation is bucketed (band, bkey); exact-Jaccard
        # never goes all-pairs. The est⋈inter SortMergeJoin on
        # (doc_a, doc_b) is DELIBERATE (both sides candidate-pair-sized
        # at web scale) — gate cartesians and global windows only.
        plan = plan_of(spark, "minhash_estimate_error", execute=True)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert not _global_window_sites(plan)

    def test_coverage_curve_window_is_bounded_by_take_ordered(self, spark):
        # the rank window is legal ONLY because a TakeOrdered cap bounds
        # its input to 10k rows first — gate that the cap is in the plan
        plan = plan_of(spark, "token_coverage_curve", execute=True)
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan

    def test_cross_source_matrix_no_cartesian(self, spark):
        # pair generation inherits the df-capped shingle self-join;
        # source rollup adds keyed joins only
        plan = plan_of(spark, "dedup_cross_source_matrix", execute=True)
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)

    def test_bm25_broadcasts_stats_take_ordered(self, spark):
        # tf prunes to query terms at the scan; df and corpus stats are
        # tiny broadcasts; top-20 is TakeOrdered — no sort-merge join,
        # no global sort, no cartesian over the fact
        plan = plan_of(spark, "bm25_retrieval_topk", execute=True)
        assert "TakeOrderedAndProject" in plan
        assert "SortMergeJoin" not in plan
        assert count(r"BroadcastExchange", plan) >= 2

    def test_knn_label_purity_broadcast_query_batch(self, spark):
        # query batch broadcasts against one corpus scan; per-query
        # top-k compiles to a group-limited window, never global
        plan = plan_of(spark, "knn_label_purity", execute=True)
        assert "SortMergeJoin" not in plan
        assert "WindowGroupLimit" in plan
        assert not _global_window_sites(plan)

    def test_lsh_band_sweep_bucketed_no_cartesian(self, spark):
        # all three band configs and the truth join stay bucket-keyed;
        # the only nested-loop joins are the 3-row config table against
        # one-row broadcast aggregates (constant-table crosses, the
        # documented OK shape) — never two data-sized sides
        plan = plan_of(spark, "lsh_band_sweep_recall", execute=True)
        assert "CartesianProduct" not in plan
        for m in re.finditer(r"BroadcastNestedLoopJoin", plan):
            ctx = plan[m.start() : m.start() + 60]
            assert "BuildRight" in ctx or "IdentityBroadcast" in ctx

    def test_key_skew_no_windows_at_all(self, spark):
        # r7 (r6 verdict finding #1): the unpartitioned rank window
        # over ALL distinct keys is gone. top1/n_keys/hhi are plain
        # map-side-combined aggregates; top10 is TakeOrderedAndProject
        # (distributed per-partition top-10, bounded merge) whose
        # one-row sum broadcast-crosses the one-row stats aggregate.
        # Assert ZERO Window nodes and zero SinglePartition exchanges
        # feeding anything but the bounded one-row/10-row tails.
        plan = plan_of(spark, "key_skew_report", execute=True)
        assert "Window" not in plan  # covers WindowExec + WindowGroupLimit
        assert "TakeOrderedAndProject" in plan
        assert "partial" in plan.lower()
        assert "CartesianProduct" not in plan
        # the only nested-loop joins are one-row broadcast crosses
        for m in re.finditer(r"BroadcastNestedLoopJoin", plan):
            ctx = plan[m.start() : m.start() + 60]
            assert "BuildRight" in ctx or "IdentityBroadcast" in ctx

    def test_novelty_curve_single_hash_aggregate_chain(self, spark):
        # shingle -> min(doc_id) groupBy -> 10-row decile rollup; the
        # only wide ops are keyed aggregates, and the cumulative window
        # runs over <= 10 rows
        plan = plan_of(spark, "ngram_novelty_curve", execute=True)
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan

    def test_norm_outliers_broadcast_stats_join(self, spark):
        # per-label stats broadcast back onto the row stream: one scan,
        # two keyed aggregates, zero sort-merge joins
        plan = plan_of(spark, "embedding_norm_outliers", execute=True)
        assert "SortMergeJoin" not in plan
        assert count(r"BroadcastExchange", plan) >= 1


class TestR7OpPlans:
    """Physical-plan gates for the round-7 operators."""

    def test_pair_budget_pure_aggregates(self, spark):
        # one shingle groupBy feeding a scalar aggregate, one doc-count
        # one-row broadcast cross — no join of two data-sized sides
        plan = plan_of(spark, "jaccard_pair_budget", execute=True)
        assert "partial" in plan.lower()
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan
        assert not _global_window_sites(plan)

    def test_banded_fallback_bucket_keyed(self, spark):
        # band joins and verify joins are equi-keyed; nested-loop joins
        # only as one-row broadcast shapes
        plan = plan_of(spark, "dedup_banded_fallback", execute=True)
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)
        for m in re.finditer(r"BroadcastNestedLoopJoin", plan):
            ctx = plan[m.start() : m.start() + 60]
            assert "BuildRight" in ctx or "IdentityBroadcast" in ctx

    def test_salt_plan_no_windows(self, spark):
        # same contract as the rewritten key_skew_report: plain
        # map-side-combined aggregates, zero Window nodes
        plan = plan_of(spark, "salt_plan_report", execute=True)
        assert "Window" not in plan
        assert "partial" in plan.lower()
        assert "CartesianProduct" not in plan

    def test_type_drift_single_pass(self, spark):
        # one scan, one keyed aggregate — no join, no window, and the
        # json extraction stays inside whole-stage codegen
        plan = plan_of(spark, "cdc_type_drift_report", execute=True)
        assert "Window" not in plan
        assert "Join" not in plan
        # '*(n)' prefixes mark whole-stage-codegen spans
        assert count(r"\*\(\d+\)", plan) >= 1

    def test_pmi_takeordered_no_forced_broadcast_of_vocab(self, spark):
        # top-20 via TakeOrderedAndProject (distributed top-k); the
        # vocab joins are equi-keyed (AQE picks the strategy); only
        # one-row totals are nested-loop broadcast crosses
        plan = plan_of(spark, "top_ngram_pmi", execute=True)
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)
        for m in re.finditer(r"BroadcastNestedLoopJoin", plan):
            ctx = plan[m.start() : m.start() + 60]
            assert "BuildRight" in ctx or "IdentityBroadcast" in ctx

    def test_prefix_dup_single_groupby(self, spark):
        plan = plan_of(spark, "doc_prefix_dup_report", execute=True)
        assert "Join" not in plan
        assert "Window" not in plan
        assert "partial" in plan.lower()

    def test_centroid_shift_broadcast_dim_table(self, spark):
        # the per-dim global table (|dims| rows) broadcasts back; the
        # big side never sort-merges
        plan = plan_of(spark, "embedding_centroid_shift", execute=True)
        assert "SortMergeJoin" not in plan
        assert count(r"BroadcastExchange", plan) >= 1
        assert "Window" not in plan

    def test_ann_lsh_equi_keyed_candidates(self, spark):
        # bucket joins are hash-keyed; the per-query top-5 window is
        # group-limited, never global
        plan = plan_of(spark, "ann_lsh_topk", execute=True)
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)


class TestR8OpPlans:
    """Physical-plan gates for the round-8 operators."""

    def test_quality_keep_one_scan_one_shuffle(self, spark):
        # both window functions share the fingerprint partitioning; no
        # self-join to find duplicate groups and never a global window
        plan = plan_of(spark, "dedup_quality_keep", execute=True)
        assert "Join" not in plan
        assert not _global_window_sites(plan)
        assert count(r"Scan parquet|FileScan", plan) <= 2

    def test_hapax_two_keyed_aggregates(self, spark):
        plan = plan_of(spark, "hapax_ratio_report", execute=True)
        assert "Join" not in plan
        assert "Window" not in plan
        assert "partial" in plan.lower()

    def test_anisotropy_single_pass_no_join(self, spark):
        # sum / sum-of-squares / count ride ONE groupBy(label, dim); the
        # rollup is |labels|*|dims| rows — no join back to the base table
        plan = plan_of(spark, "embedding_anisotropy_report", execute=True)
        assert "Join" not in plan
        assert "Window" not in plan
        assert count(r"Scan parquet|FileScan", plan) <= 2

    def test_analyze_stats_pruned_scan(self, spark):
        plan = plan_of(spark, "analyze_column_stats", execute=True)
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m is not None
        cols = {c.split(":")[0] for c in m.group(1).split(",")}
        assert cols == {
            "l_quantity", "l_extendedprice", "l_discount", "l_tax"
        }
        assert "Window" not in plan

    def test_histogram_broadcast_bounds(self, spark):
        # the one-row min/max bounds broadcast-cross the scan; the bin
        # rollup is a keyed aggregate, never a global sort/window
        plan = plan_of(spark, "column_equiwidth_histogram", execute=True)
        assert "Window" not in plan
        assert "SortMergeJoin" not in plan
        assert not _global_window_sites(plan)

    def test_split_leakage_no_cartesian(self, spark):
        plan = plan_of(spark, "split_leakage_report", execute=True)
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)

    def test_cluster_split_leak_join_broadcast(self, spark):
        # the per-split rollup joins the (tiny) leak counts broadcast;
        # the CC loop's own plan hygiene is covered by its test module
        plan = plan_of(spark, "cluster_aware_split", execute=True)
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)

    def test_incremental_pairs_new_side_filtered(self, spark):
        # the posting join's left side carries the increment filter (the
        # O(increment) claim): a pmod-bucket Filter feeds the join, and
        # there is never a cartesian or global window
        plan = plan_of(spark, "dedup_incremental_pairs", execute=True)
        assert "CartesianProduct" not in plan
        assert not _global_window_sites(plan)
        assert "pmod" in plan  # the deterministic increment split

    def test_incremental_keep_scalar_crosses_only(self, spark):
        # three one-row scalar aggregates crossed broadcast-style; no
        # sort-merge join of the one-row sides, no GLOBAL window. (The
        # r10 per-shingle df rewrite deliberately uses a Window
        # PARTITIONED BY sh — one exchange replacing the old groupBy +
        # left_semi's two — so only unpartitioned windows are banned.)
        plan = plan_of(spark, "dedup_incremental_keep", execute=True)
        assert "CartesianProduct" not in plan
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "#" in spec.split("specifiedwindowframe")[0], (
                f"unpartitioned window resurfaced: {spec}"
            )
        assert not _global_window_sites(plan)

    def test_threshold_sensitivity_histogram_rollup(self, spark):
        # r8 rewrite: the per-threshold rollup rides two <=8-row bucket
        # histograms (pair bucket + per-doc max bucket) suffix-summed
        # against the 7-row threshold table. The pair table is cached
        # once and must NEVER be replicated 7x through the theta-join —
        # the old shape's DISTINCT over (threshold, doc) shuffled
        # ~14x|pairs| rows and shows up as an aggregate keyed on both
        # the threshold and a doc id.
        plan = plan_of(spark, "dedup_threshold_sensitivity", execute=True)
        assert "InMemoryTableScan" in plan
        for keys in re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", plan):
            assert not (
                "threshold_ppm" in keys
                and ("doc_a" in keys or "doc_b" in keys or "d#" in keys)
            ), f"pair-replicating rollup resurfaced: keys=[{keys}]"
        # (no explode-count gate: the shingle pipeline itself explodes, and
        # every InMemoryTableScan site re-prints its lineage subtree)
