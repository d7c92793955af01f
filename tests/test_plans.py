"""Physical-plan contracts (plans/assertions.py): the shapes we promise at
100 TB, pinned as tests at sf0.001.

The reference's physical design is two composite B-tree indexes + the
Postgres planner (SURVEY.md §4); ours is Catalyst plan shape.  Each test
asserts one scale-critical property — pushdown, pruning, broadcast, top-k,
codegen, shuffle budget — so a plan regression fails CI rather than a
cluster.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stockpulse_batch_realtime_etl_spark.functions.scalars import ts_micros
from stockpulse_batch_realtime_etl_spark.operators import serving, text, tpch
from stockpulse_batch_realtime_etl_spark.plans import assertions as P
from stockpulse_batch_realtime_etl_spark.sources.tables import load_table
from stockpulse_batch_realtime_etl_spark.sources.ticks import ticks_from_events

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ticks(spark):
    return ticks_from_events(spark, SF)


def test_latest_ticks_is_topk_not_global_sort(spark, ticks):
    df = serving.latest_ticks(ticks, "purchase", 100)
    P.assert_take_ordered(df)
    P.assert_no_cartesian(df)


def test_movers_is_single_aggregate_no_join(spark, ticks):
    from stockpulse_batch_realtime_etl_spark.operators.ohlcv import ohlcv_bars

    df = serving.movers(ohlcv_bars(ticks), 180, 20)
    # The reference's two DISTINCT ON CTEs + join (bars.py:122-144) fuse to
    # aggregates here — no join operator of any kind may appear.
    plan = P.simple_plan(df)
    assert "Join" not in plan, plan
    P.assert_take_ordered(df)


def test_q1_pushes_shipdate_filter_and_prunes_columns(spark):
    li = load_table(spark, SF, "lineitem")
    df = tpch.q1_pricing_summary(li)
    P.assert_pushed_filter(df, "l_shipdate")
    # Column pruning: the scan must read only the 7 columns Q1 touches, not
    # all 16 of lineitem.
    (cols,) = P.read_schema_columns(df)
    assert set(cols) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }, cols


def test_q3_broadcasts_dimension_side(spark):
    cust = load_table(spark, SF, "customer")
    ords = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    df = tpch.q3_shipping_priority(cust, ords, li)
    P.assert_broadcast_join(df, min_count=1)
    P.assert_no_cartesian(df)


def test_q5_no_cartesian_and_broadcasts(spark):
    args = [
        load_table(spark, SF, n)
        for n in ("region", "nation", "customer", "supplier", "orders", "lineitem")
    ]
    df = tpch.q5_local_supplier_volume(*args)
    P.assert_broadcast_join(df, min_count=2)
    P.assert_no_cartesian(df)


def test_ohlcv_bars_single_shuffle(spark, ticks):
    from stockpulse_batch_realtime_etl_spark.operators.ohlcv import ohlcv_bars

    df = ohlcv_bars(ticks)
    # scan → partial agg → ONE exchange on the group key → final agg.
    assert P.count_exchanges(df) == 1, P.simple_plan(df)
    P.assert_whole_stage_codegen(df)


def test_text_stats_tokenizes_once(spark):
    docs = load_table(spark, SF, "documents")
    df = text.text_stats(docs)
    # The token array must be materialized in one projection, not re-split
    # per consuming column (4 columns consume it).
    plan = P.formatted_plan(df)
    assert plan.count("split(trim(") <= 1, plan


def test_tick_summary_uses_scalar_subquery_not_bnlj(spark, ticks):
    df = serving.tick_summary(ticks, "purchase", 60)
    plan = P.simple_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Subquery" in P.formatted_plan(df) or "scalar-subquery" in plan


def test_fan_out_noop_when_already_parallel(spark):
    from stockpulse_batch_realtime_etl_spark.sources.tables import fan_out

    wide = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism)
    # Already at cluster parallelism → fan_out must not add an exchange.
    assert fan_out(wide) is wide
    narrow = spark.range(0, 1000, 1, 1)
    assert fan_out(narrow).rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )


def test_asof_join_is_single_shuffle_no_range_explosion(spark, ticks):
    from stockpulse_batch_realtime_etl_spark.operators.asof import asof_join
    from stockpulse_batch_realtime_etl_spark.operators.ohlcv import ohlcv_bars

    bars = ohlcv_bars(ticks).select("symbol", "bucket_start", "close")
    df = asof_join(ticks, bars, "symbol", "event_time", "bucket_start", ["close"])
    plan = P.simple_plan(df)
    # union + window, never a join operator (no BNLJ/cartesian range blowup)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Window" in plan and "Union" in plan


def test_rollup_is_expand_plus_one_aggregate(spark):
    from stockpulse_batch_realtime_etl_spark.operators import tpch

    li, ords, cust, nat = (
        load_table(spark, SF, n) for n in ("lineitem", "orders", "customer", "nation")
    )
    df = tpch.revenue_rollup(li, ords, cust, nat)
    plan = P.simple_plan(df)
    assert "Expand" in plan
    P.assert_broadcast_join(df, min_count=2)  # customer + nation broadcast


def test_ivf_no_cartesian_and_codegen(spark):
    from stockpulse_batch_realtime_etl_spark.operators import similarity

    emb = load_table(spark, SF, "embeddings")
    df = similarity.ivf_topk(emb, list(range(4)), 3, 4)
    P.assert_no_cartesian(df)
    P.assert_whole_stage_codegen(df)


def test_vwap_is_single_shuffle_aggregate(spark, ticks):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import vwap_bars

    plan = P.simple_plan(vwap_bars(ticks))
    assert plan.count("Exchange") == 1
    assert "Join" not in plan and "Sort" not in plan


def test_stats_summary_is_one_aggregate_pass(spark, ticks):
    """All nine moments + three percentiles in ONE partial/final aggregate —
    no per-statistic re-scan."""
    from stockpulse_batch_realtime_etl_spark.operators.analytics import stats_summary

    plan = P.simple_plan(stats_summary(ticks))
    assert plan.count("FileScan") == 1
    # one hash exchange for the groupBy (+ one range for the final orderBy)
    assert plan.count("Exchange hashpartitioning") == 1


def test_top_bars_per_day_plans_group_limit(spark, ticks):
    """rank<=k must push a per-partition group-limit below the shuffle —
    never sort whole days to keep 3 rows."""
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        top_bars_per_day,
    )
    from stockpulse_batch_realtime_etl_spark.operators.ohlcv import ohlcv_bars

    plan = P.simple_plan(top_bars_per_day(ohlcv_bars(ticks), 3))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan  # map-side pre-prune before the day shuffle


def test_pivot_preaggregates_before_shuffle(spark, ticks):
    """Static-value pivot: no distinct-values job (one scan) and a partial
    (hour, symbol) aggregate so the shuffle carries groups, not ticks."""
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        hourly_symbol_pivot,
    )

    plan = P.simple_plan(hourly_symbol_pivot(ticks))
    assert plan.count("FileScan") == 1
    assert "pivotfirst" in plan and "partial_count" in plan


def test_time_range_stats_single_sort_range_frame(spark, ticks):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        time_range_stats,
    )

    plan = P.simple_plan(time_range_stats(ticks, 10))
    assert plan.count("Sort") == 1 and plan.count("Exchange") == 1
    assert "RangeFrame" in plan


def test_notable_days_reuses_daily_subtrees(spark, ticks):
    """The set-op arms must share the flagged daily subtrees via AQE
    exchange reuse: after execution at most 2 distinct scans survive
    (price-pruned and volume-pruned) and reuse nodes appear."""
    from stockpulse_batch_realtime_etl_spark.operators.analytics import notable_days

    df = notable_days(ticks)
    df.collect()  # AQE final plan materializes after execution
    plan = P.simple_plan(df)
    # explain prints the executed plan first, then the initial plan; scan
    # budget applies to the executed section
    executed = plan[: len(plan) // 2] if plan.count("FileScan") > 4 else plan
    assert "ReusedExchange" in plan
    assert executed.count("FileScan") <= 3


def test_sliding_bars_pane_merge_two_aggregates_no_tick_duplication(spark, ticks):
    """The pane plan aggregates ticks ONCE into panes, then explodes panes —
    the explode (Generate) must sit ABOVE the first hash aggregate, so the
    shuffle never carries ticks x overlap."""
    from stockpulse_batch_realtime_etl_spark.operators.ohlcv import sliding_bars

    plan = sliding_bars(ticks, 5, 1)._jdf.queryExecution().executedPlan().toString()
    gen = plan.find("Generate")
    aggs = [i for i in range(len(plan)) if plan.startswith("HashAggregate", i)]
    assert gen != -1 and aggs, plan[:800]
    # deepest (= last printed) aggregate is the pane aggregate, below Generate
    assert any(i > gen for i in aggs), "pane aggregate missing below explode"
    P.assert_no_cartesian(sliding_bars(ticks, 5, 1))


def test_ema_chunked_has_no_per_symbol_ceiling(spark, ticks):
    """The chunked EMA's heavy stage groups by (symbol, chunk): far more
    groups than symbols, and the carry join is broadcast."""
    from stockpulse_batch_realtime_etl_spark.operators.rolling import ema

    df = ema(ticks, 0.2, chunk_seconds=3600)
    P.assert_broadcast_join(df, min_count=1)
    P.assert_no_cartesian(df)
    n_symbols = ticks.select("symbol").distinct().count()
    groups = ticks.select(
        "symbol", F.floor(ts_micros("event_time") / 3_600_000_000).alias("c")
    ).distinct().count()
    assert groups > n_symbols * 4


def test_tfidf_broadcasts_vocabulary(spark):
    from stockpulse_batch_realtime_etl_spark.operators.text import tfidf_top_terms

    docs = load_table(spark, SF, "documents")
    df = tfidf_top_terms(docs, 5)
    P.assert_broadcast_join(df, min_count=1)  # vocabulary-sized df table
    P.assert_no_cartesian(df)
    # N is a scalar subquery, not a BroadcastNestedLoopJoin
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_rolling_window_partitions_by_symbol_and_bucket(spark, ticks):
    """The window stage must partition on (symbol, _bucket), not symbol
    alone — the plan's Window operator shows both partition keys."""
    from stockpulse_batch_realtime_etl_spark.operators.rolling import rolling_stats

    plan = (
        rolling_stats(ticks, 10, bucket_seconds=86_400)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    wins = re.findall(r"Window .*?partition", plan)
    assert "_bucket" in plan, plan[:800]


def test_contamination_overlap_broadcasts_eval_grams(spark):
    docs = load_table(spark, SF, "documents")
    df = text.contamination_overlap(docs, n=3)
    # eval side must collapse + broadcast; train side must never sort-merge
    P.assert_broadcast_join(df)
    plan = P.simple_plan(df)
    assert "SortMergeJoin" not in plan, plan
    P.assert_no_cartesian(df)


def test_bigram_lm_no_cartesian_no_bnlj(spark):
    docs = load_table(spark, SF, "documents")
    df = text.bigram_lm_scores(docs)
    plan = P.simple_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    P.assert_no_cartesian(df)


def test_mixture_sample_broadcasts_quota_table(spark):
    docs = load_table(spark, SF, "documents")
    df = text.mixture_sample(docs, {"src0": 0.5, "src1": 0.5})
    P.assert_broadcast_join(df)
    P.assert_no_cartesian(df)


def test_pack_sequences_single_shuffle(spark):
    """Packing's only exchange is the per-shard window partitioning — one
    shuffle, no join, no cartesian."""
    from stockpulse_batch_realtime_etl_spark.operators.text import pack_sequences

    docs = load_table(spark, SF, "documents")
    df = pack_sequences(docs, 512, 8)
    P.assert_no_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # window partitioning exchange + (possibly) the fan_out round-robin;
    # no hash-join exchanges beyond those
    assert "Join" not in plan, plan[:600]


def test_curation_funnel_single_pass(spark):
    """All five stage counts come from ONE aggregate over the flag join —
    the plan has exactly one final single-row aggregate and no cartesian."""
    from stockpulse_batch_realtime_etl_spark.operators.text import curation_funnel

    docs = load_table(spark, SF, "documents")
    df = curation_funnel(docs)
    P.assert_no_cartesian(df)


def test_winnowed_fingerprints_join_free(spark):
    """Winnowing fans each position to its windows IN-ARRAY: no self-join
    anywhere in the plan."""
    from stockpulse_batch_realtime_etl_spark.operators.text import (
        winnowed_fingerprints,
    )

    docs = load_table(spark, SF, "documents")
    df = winnowed_fingerprints(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:600]


def test_temperature_mixture_broadcasts_quotas(spark):
    from stockpulse_batch_realtime_etl_spark.operators.text import (
        temperature_mixture,
    )

    docs = load_table(spark, SF, "documents")
    df = temperature_mixture(docs, total=100)
    P.assert_broadcast_join(df, min_count=1)
    P.assert_no_cartesian(df)


def test_decoded_stats_no_shuffle_beyond_fanout(spark):
    """The multimodal encode→decode chain is per-row compute: the only
    exchange allowed is fan_out's round-robin (local[32] single-file
    parallelism guard) — a hash shuffle here would mean the codec path
    grew a grouping it doesn't need."""
    from stockpulse_batch_realtime_etl_spark.operators import multimodal

    docs = load_table(spark, SF, "documents")
    df = multimodal.decoded_stats(multimodal.encode_assets(docs))
    plan = P.simple_plan(df)
    assert "hashpartitioning" not in plan, plan
    assert plan.count("Exchange") <= 1, plan  # the fan_out round-robin only
    P.assert_no_cartesian(df)


def test_recall_report_broadcasts_everything(spark):
    """recall@k inputs are O(Q*k) rows: the hit join and the 1-row total
    must broadcast — a sort-merge join here would shuffle the (tiny)
    result sets and pointlessly serialize the report stage."""
    from stockpulse_batch_realtime_etl_spark.operators.similarity import (
        recall_report,
    )

    truth = spark.createDataFrame(
        [(1, 10), (1, 11)], "query_id long, cand_id long"
    )
    approx = {
        "a": spark.createDataFrame([(1, 10)], "query_id long, cand_id long")
    }
    df = recall_report(truth, approx)
    plan = P.simple_plan(df)
    assert "SortMergeJoin" not in plan, plan
    P.assert_broadcast_join(df)


def test_pii_scan_is_shuffle_free_codegen(spark):
    from stockpulse_batch_realtime_etl_spark.operators import pii

    docs = load_table(spark, SF, "documents")
    df = pii.pii_scan(pii.inject_synthetic_pii(docs))
    # pure per-row regex projection: nothing but the fan_out exchange
    assert P.count_exchanges(df) <= 1, P.simple_plan(df)
    P.assert_whole_stage_codegen(df)
    red = pii.pii_redact(pii.inject_synthetic_pii(docs))
    assert P.count_exchanges(red) <= 1, P.simple_plan(red)


def test_segment_dedup_two_shuffle_budget(spark):
    docs = load_table(spark, SF, "documents")
    # df-count + regroup-by-doc (+ fan_out, + the join's second branch of the
    # SAME exploded table): segment-keyed exchanges, never a cartesian
    df = text.segment_dedup_stats(docs)
    P.assert_no_cartesian(df)
    plan = P.simple_plan(df)
    assert "Window" not in plan, plan  # order restored in-array, not window sort
    bp = text.boilerplate_segments(docs)
    # explode → count_distinct's two-phase expansion: partial dedup keyed on
    # (segment, doc_id), then the (segment) aggregate — both map-side
    # combined — plus the fan_out exchange.  3 total, none row-fanning.
    assert P.count_exchanges(bp) <= 3, P.simple_plan(bp)


def test_semantic_dedup_joins_on_cell_no_cartesian(spark):
    from stockpulse_batch_realtime_etl_spark.operators import similarity

    emb = load_table(spark, SF, "embeddings")
    df = similarity.semantic_dedup(emb, 4, 1, 0.5)
    P.assert_no_cartesian(df)
    plan = P.simple_plan(df)
    # pair scan is the per-cell GEMM (grouped by cell — still a bucketed
    # candidate space, Σ|cell|² pairs); the keep-list attaches via a join
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_dedup_survivors_single_aggregate_no_window(spark):
    from stockpulse_batch_realtime_etl_spark.operators import dedup

    docs = load_table(spark, SF, "documents")
    df = dedup.dedup_survivors(docs)
    plan = P.simple_plan(df)
    assert "Window" not in plan, plan  # max_by aggregate, not a window sort
    P.assert_no_cartesian(df)


def test_user_sessions_single_exchange(spark):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        user_sessions,
    )

    ev = load_table(spark, SF, "events")
    df = user_sessions(ev)
    # window (lag + running sum) and the (user, session) groupBy share the
    # user_id hash partitioning: exactly one Exchange in the whole plan
    assert P.count_exchanges(df) == 1, P.simple_plan(df)


def test_chunked_windows_shuffle_free(spark):
    docs = load_table(spark, SF, "documents")
    df = text.chunked_windows(docs)
    assert P.count_exchanges(df) <= 1, P.simple_plan(df)  # fan_out only
    P.assert_whole_stage_codegen(df)


def test_source_kl_broadcasts_totals(spark):
    docs = load_table(spark, SF, "documents")
    df = text.source_kl_divergence(docs)
    P.assert_no_cartesian(df)  # the 1-row total joins via broadcast
    P.assert_broadcast_join(df, 2)  # per-source totals + corpus total


def test_segment_dedup_skew_join_ready(spark):
    # the seg⋈dfreq join keys on raw segment text — hot boilerplate keys
    # are expected on real corpora.  Pin: it is a segment-keyed shuffle
    # join (correctly NOT a broadcast of a corpus-scale df table, no
    # cartesian) executing under AQE skew-join splitting.
    docs = load_table(spark, SF, "documents")
    df = text.segment_dedup_stats(docs)
    P.assert_no_cartesian(df)
    P.assert_skew_join_ready(df)
    plan = P.simple_plan(df)
    assert "segment" in plan, plan


def test_bm25_topk_broadcasts_stats_no_global_sort(spark):
    docs = load_table(spark, SF, "documents")
    df = text.bm25_scores(docs, ("spark", "hash"), k=10)
    # final ranking is top-k (TakeOrderedAndProject), never a global sort;
    # df table and the 1-row (N, avgdl) stats join back broadcast
    P.assert_take_ordered(df)
    P.assert_broadcast_join(df)


def test_q14_pushdown_and_broadcast_part(spark):
    li = load_table(spark, SF, "lineitem")
    pt = load_table(spark, SF, "part")
    df = tpch.q14_promo_revenue(li, pt)
    P.assert_pushed_filter(df, "l_shipdate")
    P.assert_broadcast_join(df)
    P.assert_no_cartesian(df)


def test_q10_topk_with_broadcast_dims(spark):
    cu = load_table(spark, SF, "customer")
    od = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    na = load_table(spark, SF, "nation")
    df = tpch.q10_returned_items(cu, od, li, na)
    P.assert_take_ordered(df)
    P.assert_broadcast_join(df, min_count=2)
    P.assert_pushed_filter(df, "l_returnflag")


def test_orders_profile_single_aggregate_no_join(spark):
    from stockpulse_batch_realtime_etl_spark.operators.analytics import (
        table_profile,
    )

    df = table_profile(load_table(spark, SF, "orders"))
    plan = P.simple_plan(df)
    assert "Join" not in plan, plan          # one scan, no self-joins
    assert "Generate" in plan, plan          # explode of the struct array
    P.assert_no_cartesian(df)


def test_ngram_novelty_skew_ready_no_cartesian(spark):
    docs = load_table(spark, SF, "documents")
    df = text.ngram_novelty(docs, 3)
    P.assert_no_cartesian(df)
    P.assert_skew_join_ready(df)             # gram join can be hot-keyed


def test_ngram_novelty_hot_set_takes_salted_join(spark):
    """With a finite hot_df_threshold the gram join-back splits: hot grams
    go through skew.salted_join (fact salted xxhash64 % 16, dim exploded
    across the salt range), the split itself is a pair of BROADCAST
    semi/anti joins on the tiny hot-key set, and the cold remainder keeps
    the plain equi-join.  This is the registered query's plan (the gate
    runs hot_df_threshold=4)."""
    docs = load_table(spark, SF, "documents")
    df = text.ngram_novelty(docs, 3, hot_df_threshold=4)
    P.assert_no_cartesian(df)
    plan = P.simple_plan(df)
    assert "_salt" in plan, plan             # salted join key present
    assert "xxhash64" in plan, plan          # fact-side salt function
    # hot/cold split is broadcast, not a shuffle: both the semi and the
    # anti join against the hot-key set must be broadcast joins
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # dim side replicated across the salt range via explode of a sequence
    assert "Generate explode" in plan or "explode(" in plan, plan


def test_incremental_dedup_no_cartesian_band_equijoin(spark):
    from stockpulse_batch_realtime_etl_spark.operators.dedup import (
        incremental_dedup,
    )

    docs = load_table(spark, SF, "documents")
    df = incremental_dedup(docs, 400)
    P.assert_no_cartesian(df)                # bucket equi-join, never all-pairs
    plan = P.simple_plan(df)
    assert "band_hash" in plan, plan


def test_q13_outer_join_preserves_zero_bucket(spark):
    cu = load_table(spark, SF, "customer")
    od = load_table(spark, SF, "orders")
    df = tpch.q13_order_count_distribution(cu, od)
    plan = P.simple_plan(df)
    # the zero-order bucket requires an OUTER join — an inner join here
    # would silently drop exactly the rows Q13 exists to count
    assert "LeftOuter" in plan or "RightOuter" in plan, plan
    P.assert_no_cartesian(df)
    # conservation law an inner join would break the moment a customer has
    # no qualifying orders: every customer lands in exactly one bucket
    total = sum(r["custdist"] for r in df.collect())
    assert total == cu.count()
    # zero bucket exercised explicitly (sf0.001 has no orderless customer):
    tiny_cu = spark.createDataFrame([(1,), (2,)], "c_custkey long")
    tiny_od = spark.createDataFrame(
        [(10, 1, "5-LOW")], "o_orderkey long, o_custkey long, o_orderpriority string"
    )
    tiny = {
        r["c_count"]: r["custdist"]
        for r in tpch.q13_order_count_distribution(tiny_cu, tiny_od).collect()
    }
    assert tiny == {0: 1, 1: 1}


def test_q18_having_first_then_broadcast_back(spark):
    cu = load_table(spark, SF, "customer")
    od = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    df = tpch.q18_large_orders(cu, od, li)
    P.assert_take_ordered(df)
    P.assert_broadcast_join(df, min_count=2)
    P.assert_no_cartesian(df)
    out = df.collect()
    assert all(r["total_qty"] > 300.0 for r in out)


def test_q19_disjunction_splits_sides(spark):
    li = load_table(spark, SF, "lineitem")
    pt = load_table(spark, SF, "part")
    df = tpch.q19_disjunctive_revenue(li, pt)
    P.assert_broadcast_join(df)
    P.assert_no_cartesian(df)
    plan = P.simple_plan(df)
    # Catalyst derives single-side implied conjuncts from the OR blocks:
    # the lineitem side gets a quantity range scan filter (1 <= q <= 30)
    # without waiting for the join
    assert "l_quantity" in plan, plan


def test_obv_prefix_scan_no_cartesian_no_python(spark):
    from stockpulse_batch_realtime_etl_spark.operators.rolling import obv

    df = obv(ticks_from_events(spark, SF))
    P.assert_no_cartesian(df)
    plan = P.simple_plan(df)
    # the sequential-looking cumulative sum is really: bucketed local scans
    # + a bucket-summary prefix joined back — two window specs, one join,
    # zero Python
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_max_drawdown_prefix_scan_shape(spark):
    from stockpulse_batch_realtime_etl_spark.operators.rolling import (
        max_drawdown,
    )

    df = max_drawdown(ticks_from_events(spark, SF))
    P.assert_no_cartesian(df)
    out = {r["symbol"]: r for r in df.collect()}
    assert out and all(r["max_drawdown"] <= 0.0 for r in out.values())


def test_rfm_no_global_sort_no_ntile(spark):
    """Quartile scores must come from broadcast percentile cutoffs, never an
    ntile() global window (single-partition sort over all users)."""
    from stockpulse_batch_realtime_etl_spark.operators.analytics import rfm_segments

    df = rfm_segments(load_table(spark, SF, "events"))
    import re

    plan = P.simple_plan(df)
    # \b: "percentile(" (the cutoff aggregate, wanted) contains "ntile("
    assert not re.search(r"\bntile\(", plan), plan
    # the corpus-max and cutoff frames are 1-row broadcasts: they join as
    # BroadcastNestedLoopJoin (no key), which is O(n·1) — fine; a
    # CartesianProduct (both sides shuffled) would not be
    assert plan.count("BroadcastNestedLoopJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_q7_two_path_nation_join_broadcasts_all_dims(spark):
    cu = load_table(spark, SF, "customer")
    od = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    su = load_table(spark, SF, "supplier")
    na = load_table(spark, SF, "nation")
    df = tpch.q7_nation_volume(li, od, cu, su, na)
    # customer, supplier, nation×2 all broadcast; the only shuffled join
    # is lineitem⋈orders on orderkey
    P.assert_broadcast_join(df, min_count=4)
    P.assert_no_cartesian(df)
    out = df.collect()
    assert out and all(r["supp_nation"] != r["cust_nation"] for r in out)


def test_q22_anti_join_with_scalar_average(spark):
    cu = load_table(spark, SF, "customer")
    od = load_table(spark, SF, "orders")
    df = tpch.q22_global_sales_opportunity(cu, od)
    plan = P.simple_plan(df)
    assert "LeftAnti" in plan, plan
    P.assert_no_cartesian(df)
    rows = df.collect()
    # conservation: every counted customer is above-average AND orderless —
    # cross-check against the independent anti-join count
    from pyspark.sql import functions as F

    total = sum(r["numcust"] for r in rows)
    avg_bal = (
        cu.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
              / F.count(F.lit(1))).alias("a"))
        .collect()[0]["a"]
    )
    direct = (
        cu.filter(F.col("c_acctbal") > avg_bal)
        .join(
            od.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
            .select("o_custkey"),
            cu["c_custkey"] == F.col("o_custkey"),
            "left_anti",
        )
        .count()
    )
    assert total == direct


def test_rolling_frame_aggregates_not_duplicated(spark, ticks):
    """Catalyst does not CSE window expressions: inlining a frame
    aggregate into several output formulas plans it several times
    (bollinger_bands shipped 21 sliding-frame aggregates where 3 suffice
    — 2.9 s → 1.4 s at sf0.1 once materialized).  Pin the per-operator
    window-aggregate instance counts."""
    import re

    from stockpulse_batch_realtime_etl_spark.operators import rolling

    def frame_aggs(df):
        plan = P.simple_plan(df)
        return len(
            re.findall(
                r"(?:sum|count|avg|min|max)\([^;]*?windowspecdefinition",
                plan,
            )
        )

    # 3 = sum(x), sum(x²), count — exactly the moment set
    assert frame_aggs(rolling.bollinger_bands(ticks)) == 3
    # 3 = gain sum, loss sum, count
    assert frame_aggs(rolling.rsi(ticks)) == 3
    # 2 = channel max, channel min
    assert frame_aggs(rolling.donchian_breakouts(ticks)) == 2


def test_minhash_signature_aggregate_stays_hash_based(spark):
    """Round-12: the k-minhash groupBy packs each salted-md5 PREFIX into
    a BIGINT so all k ``min`` buffers are flat primitives — the aggregate
    over the exploded shingle stream (the widest stream in the dedup
    module) must be a HashAggregate, never a SortAggregate (a
    ``min(<hex string>)`` buffer demotes it to a per-partition sort of
    that stream)."""
    from stockpulse_batch_realtime_etl_spark.operators import dedup

    docs = load_table(spark, SF, "documents")
    df = dedup.minhash_signatures(docs)
    P.assert_hash_aggregate_only(df)


def test_assignment_argmax_stays_hash_based(spark):
    """Round-12: every nearest-centroid argmax packs its (6dp score, id)
    pair into one BIGINT (similarity._pack_argmin) so the aggregate
    buffer is a flat primitive — the flat assignment AND the two-level
    routed assignment must plan zero SortAggregates (the r11 min(struct)
    buffer was still sort-demoted, just over narrow rows)."""
    from stockpulse_batch_realtime_etl_spark.operators import similarity as sim

    emb = load_table(spark, SF, "embeddings")
    vecs = emb.select(
        "vec_id", "embedding", sim._norm(F.col("embedding")).alias("nrm")
    )
    cent = emb.filter("vec_id < 8").select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    P.assert_hash_aggregate_only(sim._assign_cells(vecs, cent, ncells=8))
    P.assert_hash_aggregate_only(
        sim._assign_cells_two_level(vecs, cent, 3, nprobe=2)
    )


def test_gapfill_and_survivor_aggregates_stay_hash_based(spark, ticks):
    """Round-12: gapfill's per-day last-close aggregate (max_by with a
    null-masked primitive ordering instead of a struct-max) runs over the
    DENSE minute grid, and the survivor pick (quality packed with doc_id
    into one BIGINT ordering) runs over the candidate-doc stream — both
    must stay hash-based end to end."""
    from stockpulse_batch_realtime_etl_spark.operators import dedup
    from stockpulse_batch_realtime_etl_spark.operators.ohlcv import (
        gapfill_bars,
        ohlcv_bars,
    )

    P.assert_hash_aggregate_only(gapfill_bars(ohlcv_bars(ticks)))
    docs = load_table(spark, SF, "documents")
    P.assert_hash_aggregate_only(dedup.dedup_survivors(docs))


def test_pq_kmeans_report_and_language_id_argmaxes_stay_hash_based(spark):
    """Round-12 second audit pass: the PQ code argmin (packed BIGINT with
    the _PQ_DIST_CAP guard), kmeans_cell_report's argmax+max(cos), and
    language_id's packed lang-index vote all plan without SortAggregate
    (their min_by forms sorted corpus-scale streams)."""
    from stockpulse_batch_realtime_etl_spark.operators import (
        similarity as sim,
        text,
    )

    emb = load_table(spark, SF, "embeddings")
    docs = load_table(spark, SF, "documents")
    P.assert_hash_aggregate_only(sim.pq_codebooks(emb))
    P.assert_hash_aggregate_only(sim.kmeans_cell_report(emb, ncells=8))
    P.assert_hash_aggregate_only(text.language_id(docs))
