"""Physical-plan regression tests: the *shape* of the plan is part of the
contract at 100 TB (SCALE.md). A refactor that silently drops a pushed
filter, breaks broadcast selection, or turns top-k into a global sort would
still pass value checks at sf0.01 — these tests catch it."""

from __future__ import annotations

import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY

from .conftest import SF_CORRECTNESS


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF_CORRECTNESS)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filters_reach_parquet_scan(spark):
    plan = _plan(spark, "top_orders_by_revenue")
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "top_orders_by_revenue")
    # lineitem has 11 columns; the query needs 4 (key, price, discount, shipdate)
    read = next(l for l in plan.splitlines() if "ReadSchema" in l and "l_orderkey" in l)
    assert read.count(":") - 1 <= 4, read  # struct<a:t,b:t,...> -> n fields


def test_dim_joins_broadcast(spark):
    for name in ["rewards_by_member", "rewards_by_quest", "region_customer_counts"]:
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_topk_is_take_ordered_not_global_sort(spark):
    for name in ["recent_events_topk", "top_orders_by_revenue", "event_lag_topk"]:
        assert "TakeOrderedAndProject" in _plan(spark, name), name


def test_aggregates_have_map_side_partials(spark):
    for name in ["lineitem_pricing_summary", "event_type_stats"]:
        plan = _plan(spark, name)
        assert "partial_" in plan, name  # partial agg before the exchange


def test_sessionization_uses_native_merging_sessions(spark):
    assert "MergingSessions" in _plan(spark, "user_sessions")


def test_bigbig_join_degrades_to_sort_merge_without_broadcast(spark):
    # the 100 TB contract for top_orders_by_revenue (SCALE.md): with the
    # broadcast path unavailable, the same declared plan must become a
    # sort-merge join on the equi-key — never a nested-loop/cartesian.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "top_orders_by_revenue")
        assert "SortMergeJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_generator_agg_has_map_side_partials(spark):
    # explode -> count must combine map-side: the shuffle carries (token,
    # partial count), never the exploded rows themselves.
    plan = _plan(spark, "doc_token_topk")
    assert "explode(split" in plan
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in _plan(spark, "event_gap_topk")


def test_cube_uses_single_expand_pass(spark):
    # CUBE = one scan + Expand, not a union of 4 aggregations
    plan = _plan(spark, "event_type_daily_cube")
    assert "Expand" in plan
    # one physical source scan feeds all four grouping sets
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_scalar_subquery_broadcasts_one_row(spark):
    # the global-average comparison must broadcast the 1-row aggregate,
    # never materialize a cartesian product
    plan = _plan(spark, "orders_above_avg_price")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_interval_join_is_keyed_not_cartesian(spark):
    # band join keeps the user_id equi-key for the shuffle; the time band
    # is a residual condition
    plan = _plan(spark, "view_purchase_interval_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_cartesian_products(spark):
    # cross joins in the inventory are all broadcast-1-row by construction;
    # a real CartesianProduct node means someone dropped a join key.
    # sync_run_log is excluded: building its DataFrame RUNS the streaming
    # CDC pipeline (its result is a collected local relation, whose plan
    # trivially has no joins) — executing it here costs ~5s for nothing.
    for name, q in REGISTRY.items():
        if q.oracle is None or name == "sync_run_log":
            continue
        assert "CartesianProduct" not in _plan(spark, name), name


def test_near_dup_pair_joins_are_equi_not_nested_loop(spark):
    # the pair-generating joins must be shuffle/broadcast EQUI-joins on a
    # chunk or block key — a BroadcastNestedLoopJoin (the old
    # `id_a < id_b`-only theta join) broadcasts a whole table side and
    # cannot scale; same for a CartesianProduct.
    for name in ["embedding_near_dup_pairs", "srp_bucket_near_dups"]:
        plan = _plan(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    # chunk key drives the scan pair join; block key drives the bucket join
    assert "_cb" in _plan(spark, "embedding_near_dup_pairs")
    srp_plan = _plan(spark, "srp_bucket_near_dups")
    assert "blk" in srp_plan and "val" in srp_plan


def test_grouping_sets_uses_single_expand_pass(spark):
    # GROUPING SETS ((type, day), (day)) = one scan + Expand, not a UNION
    # of two aggregations
    plan = _plan(spark, "event_type_grouping_sets")
    assert "Expand" in plan
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Union" not in plan


def test_unpivot_is_map_side_expand(spark):
    # melting wide -> long is Expand (row fan-out), which must not add an
    # exchange beyond the pivot aggregation's own shuffle + the final sort
    plan = _plan(spark, "user_event_type_unpivot")
    assert "Expand" in plan
    # two-stage pivot aggregation (2 hash exchanges) + final sort (1 range
    # exchange); the unpivot Expand itself must add none
    assert plan.count(") Exchange") <= 3


def test_scd2_history_is_one_window_shuffle(spark):
    # SCD2 = one lead() window keyed by the entity key: exactly one hash
    # exchange on user_id feeding the window sort, plus the final orderBy's
    # range exchange — never a global (partition-less) window
    plan = _plan(spark, "user_state_history")
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan
    assert "SinglePartition" not in plan


def test_repetition_stats_shuffles_keyed_by_doc(spark):
    # duplicate-word stats are per-row array ops; bigram aggregation keys
    # every exchange by (doc) id — no global collect, no cartesian
    plan = _plan(spark, "doc_repetition_stats")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "id" in line, line


def test_bm25_prunes_postings_and_broadcasts_stats(spark):
    plan = _plan(spark, "bm25_topk_docs")
    # the query-term filter must run before the (doc, term) grouping: the
    # partial agg's exchange carries query-term postings only
    assert plan.index("Filter") < plan.index("partial_count")
    # df table and corpus stats ride broadcasts; final is TakeOrdered
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats cross join
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_language_rebalance_no_data_shuffle(spark):
    plan = _plan(spark, "language_rebalance_sample")
    # per-lang counts + min are broadcast side inputs; the documents pass
    # itself is a filtered projection — its only exchange is the final
    # presentation sort's range partitioning
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # the tiny agg sides
    # column pruning: text never leaves the scan
    read = next(
        l for l in plan.splitlines() if "ReadSchema" in l and "doc_id" in l
    )
    assert "text" not in read, read


def test_top_docs_per_source_windows_are_salt_scoped(spark):
    plan = _plan(spark, "top_docs_per_source")
    # phase-1 window partitions by (source, salt), phase 2 by source only —
    # two window nodes, no global (empty-partition) window
    assert plan.count("Window") >= 2
    assert "partitionBy=[]" not in plan.replace(" ", "")


def test_substring_dup_is_one_shingle_pass(spark):
    # hot-ness = min(id) != max(id) over the hash window, tagged IN-STREAM:
    # the expensive shingle construction runs once — no self-join, no
    # hot-set aggregate joined back, never a nested-loop/cartesian
    plan = _plan(spark, "substring_dup_stats")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # map-side partials on the id agg


def test_bpe_pair_scan_is_map_side_topk(spark):
    # pair counting collapses map-side (bounded |charset|^2 key space) and
    # the top-25 is per-partition heaps, never a global sort
    plan = _plan(spark, "bpe_pair_candidates")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_winnowing_hot_fp_cap_is_instream_window(spark):
    # the stop-fingerprint drop is a count window over the SAME fp
    # partitioning the self-join needs — applied IN-STREAM on each join
    # side (identical subplans; the exchange is reusable at scale), never a
    # separate df-count aggregate + anti-join, which would shuffle the
    # index twice more (measured ~2x end-to-end). Shape pins: the cap's
    # Window is present, there is no anti-join, and only the two join
    # sides scan the documents table.
    plan = _plan(spark, "winnowing_overlap_pairs")
    assert "Window" in plan
    assert "LeftAnti" not in plan
    # formatted explain mentions each scan twice (tree + details): 2 scans
    assert plan.count("Scan parquet") <= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_adc_scan_is_codegen_topk_no_join(spark):
    # the ADC serving scan: codes table -> literal-table lookups -> top-k.
    # No join, no aggregate exchange — one narrow scan + TakeOrdered.
    plan = _plan(spark, "pq_ann_topk")
    # everything feeding the top-k is projection over the codes frame
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange" not in plan  # zero shuffles: scan -> project -> top-k
    assert "codegen id" in plan  # lookups stay in whole-stage codegen


def test_trailing_window_single_keyed_shuffle(spark):
    plan = _plan(spark, "customer_order_trailing_30d")
    # one HASH exchange keyed on the customer feeding the window (the
    # only other exchange is the presentation orderBy's range partitioning)
    assert plan.count("hashpartitioning(o_custkey") == 1
    assert "Window" in plan


def test_zorder_key_is_pure_projection(spark):
    # after the 4-scalar min/max collect, the key computation itself must
    # be shuffle-free whole-stage codegen over the scan
    plan = _plan(spark, "orders_zorder_keys")
    assert "Exchange hashpartitioning" not in plan
    assert "TakeOrderedAndProject" in plan  # top-50 by zkey, no global sort


def test_salted_join_spreads_key_space(spark):
    plan = _plan(spark, "event_type_salted_join")
    # the salt must be part of the join key (spread), and the plan must
    # not degrade to a cartesian
    assert "_salt" in plan
    assert "CartesianProduct" not in plan


def test_lm_buckets_have_no_unpartitioned_window(spark):
    plan = _plan(spark, "doc_lm_quality_buckets")
    # global ranks come from range partition + mapInPandas stamping;
    # an unpartitioned window would appear as a SinglePartition exchange
    # feeding a Window node
    assert "MapInPandas" in plan
    assert "Window" not in plan


def test_phash_pairs_join_is_block_equi(spark):
    plan = _plan(spark, "media_phash_near_dups")
    # candidates meet on the (block-id, block-value) equi-key — never a
    # broadcast nested loop over all pairs
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_correlated_exists_decorrelates_to_semi_join(spark):
    plan = _plan(spark, "late_ship_priority")
    # Q4 shape: the EXISTS must be ONE semi hash join with the date
    # predicate as residual — never a per-row subquery re-scan or a
    # pre-aggregated inner side
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q21_shape_is_single_pass_window(spark):
    plan = _plan(spark, "lone_late_supplier")
    # the EXISTS / NOT EXISTS pair is algebraized into two per-order
    # distinct-supplier window counts over ONE lateness-flagged scan:
    # exactly one Window operator carrying BOTH collect_sets, the orders
    # dim broadcast, no join of lineitem against itself at all
    assert plan.count("Window (") == 1  # tree line: one Window operator
    assert plan.count("collect_set") >= 2
    assert plan.count("Scan parquet") // 2 == 2  # lineitem + orders once
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q17_brand_filter_broadcasts_before_avg(spark):
    plan = _plan(spark, "small_quantity_part_revenue")
    # the brand key set and the per-part averages both broadcast; the
    # 4x-larger lineitem side never shuffles for the semi join
    assert plan.count("BroadcastHashJoin") >= 2
    assert "PushedFilters: [IsNotNull(p_brand), EqualTo(p_brand" in plan


def test_q11_total_is_reaggregated_not_rescanned(spark):
    # the per-part and grand-total branches share one identical shuffle; AQE
    # stitches them with ReusedExchange at runtime, so lineitem is scanned
    # and partially aggregated ONCE (the static plan prints both branches)
    df = REGISTRY["part_revenue_share"].spark_fn(spark, SF_CORRECTNESS)
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "ReusedExchange" in plan


def test_dsir_selection_is_take_ordered_with_broadcast_buckets(spark):
    plan = _plan(spark, "dsir_select_docs")
    # the bounded bucket table broadcasts into the feature stream and the
    # top-100 never global-sorts
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cluster_balanced_sample_assignment_is_zero_shuffle(spark):
    plan = _plan(spark, "cluster_balanced_sample")
    # nearest-centroid assignment is a codegen projection; the only
    # exchanges are the K-row counts and the final presentation sort —
    # the corpus itself never hash-shuffles
    assert "BroadcastHashJoin" in plan
    hash_exchanges = [
        l for l in plan.splitlines()
        if "Exchange" in l and "hashpartitioning" in l
    ]
    assert len(hash_exchanges) <= 1, hash_exchanges  # the cid-counts agg only


def test_corpus_pipeline_is_single_conditional_agg(spark):
    plan = _plan(spark, "corpus_pipeline_summary")
    # every stage count reads off ONE final aggregation over the annotated
    # corpus — no per-stage scalar-subquery re-aggregations, no cartesian
    assert "CartesianProduct" not in plan
    # the final 1-row agg: exactly one SinglePartition exchange
    assert plan.count("SinglePartition") == 1, plan.count("SinglePartition")


def test_tfidf_query_postings_broadcast_and_topk(spark):
    plan = _plan(spark, "tfidf_similar_docs")
    # the query doc's bounded term vector broadcasts; top-k never
    # global-sorts; nothing degrades to a cartesian
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q5_dims_broadcast_and_region_filter_pushes(spark):
    plan = _plan(spark, "nation_revenue_q5")
    assert "EqualTo(r_name,ASIA)" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q3_topk_and_pushdown(spark):
    plan = _plan(spark, "shipping_priority_q3")
    assert "TakeOrderedAndProject" in plan  # top-10 never a global sort
    # segment filter pushed to the customer scan, date filters to both scans
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_q7_nation_dims_broadcast_twice(spark):
    plan = _plan(spark, "volume_shipping_q7")
    assert plan.count("BroadcastHashJoin") >= 2  # both nation aliases


def test_q19_single_side_implications_reach_scans(spark):
    plan = _plan(spark, "disjunctive_part_revenue_q19")
    # factored implications at the scans: part reads only the 3 brands,
    # lineitem only the quantity hull
    assert "In(p_brand" in plan
    assert "GreaterThanOrEqual(l_quantity,1" in plan
    assert "LessThanOrEqual(l_quantity,50" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_knn_join_shuffles_only_candidate_partials(spark):
    # the corpus flows scan -> MapInPandas with NO exchange below the
    # kernel; the single exchange in the plan (q_id hash for the final
    # per-query window) sits ABOVE it and carries only the
    # <= partitions*Q*k candidate rows
    df = REGISTRY["knn_join_topk"].spark_fn(spark, SF_CORRECTNESS)
    tree = df._jdf.queryExecution().executedPlan().toString()
    assert tree.count("Exchange hashpartitioning") == 1, tree
    # toString prints parents before children: the exchange must appear
    # above the kernel, and the parquet scan below it (corpus unshuffled)
    assert (
        tree.index("Exchange hashpartitioning")
        < tree.index("MapInPandas")
        < tree.index("Scan parquet")
    ), tree


def test_q18_single_lineitem_aggregate(spark):
    # r13 shape: the HAVING subquery's per-order SUM *is* total_qty, so
    # lineitem is scanned and aggregated exactly ONCE; the ~hundreds of
    # qualifying orders broadcast to the orders join (no semi join + second
    # lineitem pass + post-join re-aggregation, which the pre-r13 form had)
    plan = _plan(spark, "large_volume_customers_q18")
    assert plan.count("Scan parquet") <= 6  # lineitem + orders + customer
    assert "BroadcastHashJoin" in plan  # qualifying-order aggregate broadcasts
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-100, never a global sort
    assert "partial_sum" in plan  # the one aggregate keeps map-side partials


def test_q10_pushdown_and_topk(spark):
    plan = _plan(spark, "returned_item_customers_q10")
    assert "EqualTo(l_returnflag,R)" in plan        # flag at the lineitem scan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # date range at orders scan
    assert "TakeOrderedAndProject" in plan


def test_q14_month_pushes_and_part_broadcasts(spark):
    plan = _plan(spark, "promo_revenue_q14")
    # the ship-month range reaches the lineitem scan; the 2-column part
    # dim broadcasts; numerator+denominator ride ONE aggregate pair
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q12_scans_prune_to_contributed_columns(spark):
    plan = _plan(spark, "late_lines_by_priority_q12")
    # each side reads only its 3 contributing columns (ReadSchema pruning)
    for marker, cap in (("l_orderkey", 3), ("o_orderkey", 3)):
        read = next(
            l for l in plan.splitlines() if "ReadSchema" in l and marker in l
        )
        assert read.count(":") - 1 <= cap, read
    # the cross-table lateness predicate is a join residual, so it can
    # never appear as a pushed scan filter
    assert "GreaterThan(l_shipdate" not in plan


def test_q22_decorrelates_to_anti_join_with_broadcast_scalar(spark):
    plan = _plan(spark, "untapped_customers_q22")
    assert "LeftAnti" in plan  # NOT EXISTS -> anti hash join
    # the 1-row scalar average joins via broadcast (nested-loop over 1 row)
    assert "BroadcastNestedLoopJoin" in plan
    # country filter pushed to the customer scan
    assert "In(c_nationkey" in plan


def test_q8_dims_broadcast_and_type_filter_semireduces(spark):
    plan = _plan(spark, "nation_market_share_q8")
    # part-type and region name filters reach their scans; nation
    # broadcasts twice (customer-side and supplier-side aliases)
    assert "EqualTo(p_type,ECONOMY)" in plan
    assert "EqualTo(r_name,ASIA)" in plan
    assert plan.count("BroadcastHashJoin") >= 4  # part, supp, n1, n2 (+region)


def test_q15_reuses_revenue_aggregate(spark):
    # the revenue view feeds both the scalar MAX and the equality filter
    # from ONE computed aggregate — AQE stitches the two branches with
    # ReusedExchange at runtime (the q11 pattern), so collect first
    df = REGISTRY["top_supplier_revenue_q15"].spark_fn(spark, SF_CORRECTNESS)
    df.collect()
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "ReusedExchange" in plan
    # year range pushed to the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_frozen_scorer_is_single_arrow_pass(spark):
    plan = _plan(spark, "doc_quality_scored_frozen")
    # one Arrow kernel pass over a 2-column pruned scan; the only
    # exchange is the output ordering's range partition — no join, no
    # aggregation shuffle
    assert "MapInPandas" in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "SortMergeJoin" not in plan and "HashAggregate" not in plan
    assert plan.count("Exchange") <= 2  # rangepartitioning only


def test_udtf_ngrams_aggregates_map_side_and_take_ordered(spark):
    plan = _plan(spark, "udtf_word_ngrams_topk")
    # the UDTF fan-out is aggregated PARTIALLY before the exchange (the
    # per-partition ngram dedup that keeps the shuffle bounded by
    # distinct grams, not total grams) and the top-25 never global-sorts
    assert "BatchEvalPythonUDTF" in plan
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    assert "ReadSchema: struct<text:string>" in plan  # 1-column pruned scan


def test_kmv_sketch_corpus_never_shuffles_below_kernel(spark):
    plan = _plan(spark, "user_reach_kmv_sketch")
    # the raw events flow scan -> filter -> MapInPandas with NO exchange
    # below the kernel (per-batch min-k partials are the only thing that
    # ever shuffles, keyed by the bounded shard key); the null filter is
    # pushed into the 3-column pruned scan
    assert "MapInPandas" in plan
    assert "PushedFilters: [IsNotNull(user_id)]" in plan
    assert "ReadSchema: struct<ts:timestamp_ntz,user_id:bigint,event_type:string>" in plan
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
    # formatted plans print each node twice (tree + detail): 3 logical
    # exchanges = shard agg, type-level merge, output ordering
    assert plan.count("Exchange") <= 6


def test_range_join_query_is_hash_join_with_residual(spark):
    plan = _plan(spark, "purchases_in_error_windows")
    # the interval predicate executes as a hash equi-join on the bin id
    # (intervals exploded into <=2 bins via Generate), never the
    # BroadcastNestedLoopJoin Spark gives a bare range predicate; the
    # exact bounds survive as a join residual
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Generate" in plan  # the interval bin explode
    assert "(p_us" in plan  # exact residual comparison on the point column


def test_quality_report_is_one_conditional_aggregation(spark):
    plan = _plan(spark, "orders_quality_report")
    # five checks compile into ONE aggregation pair over one orders scan
    # branch (plus the FK branch's broadcast anti-join and 1-row-count
    # crossJoins); never a scan per check
    assert "BroadcastHashJoin LeftAnti" in plan  # FK orphan count
    assert "SortMergeJoin" not in plan
    # 4 logical orders/customer scans x2 print occurrences (validate,
    # orphans, count, customer keys) — NOT 6 checks x table scans
    assert plan.count("Scan parquet") <= 8
    assert "count(distinct o_orderkey" in plan  # uniqueness on the same agg
