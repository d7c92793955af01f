"""Generate PLANS.md: the FINAL (post-AQE) physical plans of the headline
queries at sf0.01, annotated with the scale property each plan demonstrates.

Run: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod
from stockpulse_batch_realtime_etl_spark.plans.assertions import formatted_plan
from stockpulse_batch_realtime_etl_spark.session import get_spark

#: query → the plan property worth reading it for
HEADLINERS: dict[str, str] = {
    "ohlcv_bars": (
        "One scan, one shuffle: partial→final hash aggregate with min_by/"
        "max_by; no sort, no join. The flagship stays two stages at any scale."
    ),
    "q1_pricing_summary": (
        "Predicate pushdown (l_shipdate reaches the scan as PushedFilters) and "
        "column pruning (ReadSchema lists 7 of 16 lineitem columns)."
    ),
    "q5_local_supplier_volume": (
        "Multi-way join strategy: dimension tables broadcast "
        "(BroadcastHashJoin), the fact table is never shuffled until the "
        "final aggregate; AQE re-plans from runtime sizes."
    ),
    "movers": (
        "The reference's two DISTINCT-ON CTEs + join fused into ONE aggregate "
        "(min_by/max_by) — the plan contains no Join operator at all; ranking "
        "is TakeOrderedAndProject (top-k, no global sort)."
    ),
    "latest_ticks": (
        "ORDER BY + LIMIT plans as TakeOrderedAndProject: per-partition top-k "
        "+ driver merge — the full sort never happens."
    ),
    "tick_summary": (
        "The as-of-NOW window bound is a scalar subquery (two small jobs, one "
        "codegen'd main stage) — not a BroadcastNestedLoopJoin."
    ),
    "minhash_signatures": (
        "All k minhashes in one partial→final aggregate: the shuffle carries "
        "k hex strings per (partition, doc), independent of document length."
    ),
    "lsh_candidate_pairs": (
        "Banded self-join on md5 band hashes; AQE ReusedExchange means the "
        "expensive shingle→signature subtree executes once, not per side."
    ),
    "ticks_asof_bars": (
        "As-of join via union + ordered carry-forward: ONE shuffle on the "
        "key, one sort per partition — the merge-join shape, no range "
        "explosion."
    ),
    "revenue_rollup": (
        "ROLLUP = Expand (3 grains) feeding a single hash aggregate — one "
        "scan and one shuffle for three aggregation levels."
    ),
    "stats_summary": (
        "Nine exact-decimal moments + three interpolated percentiles in ONE "
        "ObjectHashAggregate pass — statistics whose values are independent "
        "of partitioning, so they stay parallel AND reproducible."
    ),
    "top_bars_per_day": (
        "Grouped top-k plans WindowGroupLimit (Partial below the shuffle, "
        "Final above): each map task forwards at most k rows per day — whole "
        "days are never sorted."
    ),
    "hourly_bars_rollup": (
        "Materialized-rollup cascade: hourly bars aggregate the 1-minute bar "
        "aggregate (mergeable OHLCV state), not the raw ticks — the second "
        "shuffle carries bars, ~ticks/60 rows."
    ),
    "gapfill_bars": (
        "Dense grid via sequence+explode (O(output), JVM-side), left join "
        "real bars, ONE window pass for the LOCF carry-forward."
    ),
    "symbol_correlations": (
        "Aligned self-join on the minute key + exact-decimal moment sums: "
        "pair count is |symbols|\u00b2 regardless of data volume."
    ),
    "notable_days": (
        "UNION/INTERSECT/EXCEPT arms over the same flagged daily table: AQE "
        "ReusedExchange collapses the repeated lineage to two column-pruned "
        "scans, and the corpus-mean thresholds are single-partition window "
        "aggregates over symbols×days rows."
    ),
    "sliding_bars": (
        "Pane merge: ticks aggregate ONCE into slide-sized panes (partial→"
        "final hash aggregate), the Generate (explode) sits ABOVE that "
        "aggregate — the shuffle carries pane state, never ticks × overlap."
    ),
    "rolling_stats": (
        "Bucketed ROWS frame: Window partitions on (symbol, _bucket) with "
        "carry rows injected per bucket — n_symbols × n_days tasks instead "
        "of one unbounded task per symbol."
    ),
    "contamination_overlap": (
        "Decontamination as a fan-out-1 equi-join: the eval side collapses "
        "to DISTINCT grams and broadcasts (a benchmark suite is tiny next "
        "to a 100 TB corpus), so the train side never shuffles; per-doc "
        "overlap counts are a map-side-combined hash aggregate."
    ),
    "bigram_lm_scores": (
        "LM model build + scoring in one pass over text: bigram counts by "
        "hash aggregate, the unigram table derived FROM the bigram table "
        "(no second text scan), scoring joins keyed on bigram/w1 that AQE "
        "broadcasts while the model fits; per-bigram logs rounded then "
        "DECIMAL-summed so the result is partition-order-independent."
    ),
    "ema_ticks": (
        "Chunked recursion with a fully-codegen hot path: the renormalized "
        "prefix sum (1-a)^i * SUM(a*(1-a)^-j * p) runs as a window frame "
        "over (symbol, chunk, sub-chunk); Python touches only the ~1/1024 "
        "summary stream in the carry stitch; carry table re-joined "
        "BROADCAST — no per-symbol parallelism ceiling."
    ),
    "rolling_fingerprints": (
        "Rolling-hash fingerprints with ZERO shuffles: text → int code "
        "array once, Karp–Rabin Horner as a zip_with slice ladder (O(k·len) "
        "per doc, no interpreted-lambda re-inlining), mod-p filter applied "
        "IN-ARRAY so the Generate emits only ~len/p rows."
    ),
    "fingerprint_match_pairs": (
        "MOSS-style overlap: inverted-index self-join on the fingerprint "
        "value, doc-frequency-capped (boilerplate hashes dropped via "
        "broadcast anti-join) — candidate space stays sub-quadratic."
    ),
    "tfidf_top_terms": (
        "Term stats: (doc, term) counts map-side combined, the vocabulary-"
        "sized df table re-joined BROADCAST, corpus N folded in as a scalar "
        "subquery (no BroadcastNestedLoopJoin)."
    ),
    "ann_ivf_kmeans_topk": (
        "Lloyd rounds as broadcast-join scoring passes (the corpus is never "
        "shuffled for assignment) + (cell, dim)-keyed means; search stays "
        "cell-restricted with broadcast queries."
    ),
    "packed_sequences": (
        "Concat-and-chunk sequence packing: ONE shuffle (the per-shard "
        "window) — the only sequential state is a running token sum per md5 "
        "shard, so parallelism = n_shards and grows with the corpus."
    ),
    "temperature_mixture_sample": (
        "n_s^α source resampling: counts collapse to a handful of rows, the "
        "quota table re-joins BROADCAST; one shuffle on source for the "
        "ranking window."
    ),
    "curation_funnel": (
        "The whole curation pipeline in one DAG: stage flags assemble via "
        "doc_id equi-joins (AQE broadcasts the reduced sides), all five "
        "stage counts come from a single aggregate + stack unpivot — no "
        "stage is ever re-run."
    ),
    "winnowed_fingerprints": (
        "Winnowing as a SHUFFLE-FREE vectorized Arrow seam: per-doc numpy "
        "Horner + rightmost-argmin over a sliding_window_view inside one "
        "mapInPandas, in-worker dedup — the only exchange is fan_out's "
        "round-robin (the expression formulation's explode+groupBy "
        "measured 74-416 s at the 100× probe; SCALE.md)."
    ),
    "packing_stats": (
        "Packing yield rollup: one hash aggregate over the shard layout "
        "(n_shards rows out); ceil-division stays in integer arithmetic."
    ),
    "pii_scan": (
        "Shuffle-free compliance scan: four regexp_count calls in one "
        "whole-stage-codegen projection over the pruned (doc_id, source, "
        "text) read — the plan is scan → project, nothing else."
    ),
    "segment_dedup_stats": (
        "C4 line dedup: count_distinct's two-phase expansion (partial dedup "
        "on (segment, doc_id) then the segment aggregate), flag join keyed "
        "on segment, one regroup by doc; cleaned-text order restored "
        "in-array (sort_array of structs) — no Window operator anywhere."
    ),
    "semantic_dedup": (
        "SemDeDup: the near-dup pair scan is an equi-join on the kmeans "
        "cell — candidate space Sum |cell|^2, never corpus^2; the "
        "checkpointed assignment table feeds both join sides and the "
        "keep-list join without re-running the Lloyd rounds."
    ),
    "dedup_survivors": (
        "Quality-aware survivor per dup group in ONE max_by((quality, "
        "-doc_id)) hash aggregate — map-side combinable, no window sort, "
        "composed directly over the CC label table."
    ),
    "user_sessions": (
        "Sessionization in one exchange: the lag/running-sum window and the "
        "(user, session) aggregate both consume the same user_id hash "
        "partitioning — Catalyst plans no second shuffle."
    ),
    "source_kl_divergence": (
        "Distribution drift from ONE text scan: corpus counts derive from "
        "the (source, token) aggregate; per-source totals and the corpus "
        "total broadcast back (tiny), so the only data-sized shuffle is the "
        "first aggregate."
    ),
    "bm25_scores": (
        "Query-term isin filter sits UNDER the tf aggregate (only matching "
        "pairs reach the shuffle); doc length from array size with no "
        "explode; df and the 1-row (N, avgdl) stats broadcast back; final "
        "ranking is TakeOrderedAndProject, never a global sort."
    ),
    "multimodal_png_stats": (
        "Real PNG decode (CRC + inflate + five-filter unfilter) entirely "
        "inside one Arrow mapInPandas pass after the fan_out exchange — no "
        "data-sized shuffle, per-payload CPU parallel across executors."
    ),
    "semdedup_recall_report": (
        "The deliberate all-pairs truth join (measurement harness, sf≤1) "
        "feeds two vec_id-keyed cell lookups and one 1-row aggregate — "
        "everything beyond the truth scan is linear."
    ),
    "q10_returned_items": (
        "Selective fact filters (returnflag + order-date) sit under the "
        "orderkey join; customer/nation broadcast; the top-20 is "
        "TakeOrderedAndProject."
    ),
    "q14_promo_revenue": (
        "One month-pruned scan, part broadcast, ONE conditional "
        "DECIMAL-exact aggregate — promo share without a second pass."
    ),
    "orders_profile": (
        "Every per-column stat (null/distinct/min/max) in ONE aggregate "
        "over one scan; the single result row explodes into per-column "
        "rows — no join, no per-column job."
    ),
    "ngram_novelty": (
        "In-array gram dedup before the explode; (gram → min doc_id, df) "
        "aggregate; the gram join back SPLITS on document frequency — hot "
        "grams route through skew.salted_join (xxhash64-salted fact, dim "
        "exploded across the salt range) behind a broadcast hot-key "
        "semi/anti split, cold grams keep the plain equi-join; per-doc "
        "aggregate on the exact union."
    ),
    "incremental_dedup": (
        "Fingerprints/bands built in one corpus pass, split by id "
        "predicate; exact stage joins the distinct base fingerprint set; "
        "near stage joins new-side to base-side buckets only — never "
        "new×new, never all-pairs."
    ),
    "q13_order_counts": (
        "LEFT OUTER join with the orders side PRE-AGGREGATED to "
        "(custkey, count) — the join input shrinks from |orders| to "
        "|customers-with-orders| before any wide row moves."
    ),
    "q18_large_orders": (
        "HAVING-first: the selective sum(quantity)>300 aggregate runs "
        "before any join, and the tiny survivor set broadcasts back onto "
        "orders/customer; ranking is TakeOrderedAndProject."
    ),
    "q19_disjunctive_revenue": (
        "OR-of-conjuncts split by Catalyst: part-side conjuncts filter the "
        "broadcast dimension, the implied quantity range filters the "
        "lineitem scan, the residual disjunction evaluates at the join."
    ),
    "obv_ticks": (
        "UNBOUNDED running sum as a distributed prefix scan: per-(symbol, "
        "day) local cumsum + a per-symbol prefix over BUCKET SUMMARIES "
        "joined back — integer-exact, no single-task-per-symbol ceiling."
    ),
    "rfm_segments": (
        "Quartile scores from 1-row percentile-cutoff aggregates broadcast "
        "back (BroadcastNestedLoopJoin over one row) — no ntile() global "
        "sort over users anywhere in the plan."
    ),
    "symbol_beta": (
        "Three map-side-combinable aggregates (minute bars → returns → "
        "OLS moments) and one uniform minute-key join; all numerics are "
        "DECIMAL-exact sums over 6dp-rounded returns."
    ),
    "minhash_jaccard_estimate": (
        "Signatures computed once feed both the banded bucket join "
        "(candidate generation) and the agreement estimator; exact "
        "Jaccard restricted to candidates — never all-pairs."
    ),
    "streaming_pair_join": (
        "Stream-stream inner join keyed on equal 1-minute window structs "
        "with both sides watermarked — state GC'd at the horizon, matches "
        "emitted per micro-batch, result independent of batch boundaries."
    ),
    "streaming_pair_join_outer": (
        "Stream-stream LEFT OUTER join: matches emit immediately; "
        "unmatched purchases emit null click columns only when the "
        "watermark expires their window, so end-of-run withholds rows in "
        "unexpired windows — the oracle replays that exact cutoff."
    ),
    "bollinger_bands": (
        "Rolling second moment over the bucketed overlap frame: exactly "
        "THREE sliding-frame aggregates (Σx, Σx², count in DECIMAL) "
        "materialized once — Catalyst does not CSE window expressions, so "
        "inlining them into the four band formulas would plan 21."
    ),
    "bpe_learned_merges": (
        "Distributed BPE training: one corpus pass to the word-frequency "
        "table, then per round a vocab-sized pair-count aggregate, a "
        "LIMIT-1 best-pair pick (O(1) driver scalar), and an in-array "
        "left-greedy fold — rounds chain lazily off one localCheckpoint, "
        "never re-scanning the corpus."
    ),
    "multimodal_jpeg_stats": (
        "Real baseline-JPEG decode (Huffman entropy decode, dequant, "
        "IDCT, YCbCr→RGB — operators/jpeg.py) as per-payload CPU inside "
        "Arrow mapInPandas; one shuffle-free codec pass, stats reduce "
        "per asset."
    ),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="stockpulse-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    out = [
        "# PLANS — final physical plans of the headline queries",
        "",
        f"Generated by `tools/dump_plans.py` at `{sf_dir}`.  Every plan below",
        "is the **executed** (post-AQE, isFinalPlan=true) plan — what actually",
        "ran, not the optimizer's first guess.  `tests/test_plans.py` asserts",
        "the load-bearing properties so they cannot regress silently.",
        "",
    ]
    for name, why in HEADLINERS.items():
        df = queries[name](spark, sf_dir)
        df.collect()  # finalize AQE on this exact queryExecution
        plan = formatted_plan(df)
        # keep the operator tree + scan details; drop per-operator sections
        # after the first ReadSchema block to keep the doc reviewable
        out += [f"## {name}", "", why, "", "```", plan.strip(), "```", ""]
    Path("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINERS)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
