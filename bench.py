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

    # Two reps per query, keep the min.  The host is a shared VM with
    # measured CPU-steal spikes (up to ~9% st / 40% sy in vmstat during
    # otherwise-identical runs; full-suite totals swung 66 s → 180 s with
    # GC pause-sum at 1.6 s and code-cache ruled out), so a single-shot
    # timing is dominated by neighbor noise.  min-of-3 estimates warm
    # steady-state cost (r3 measured single-query swings of 2.6 s → 33 s
    # for identical plans, so two samples still let one spike through);
    # the budget valve below keeps total wall-time bounded regardless.
    # Override with BENCH_REPS=1 for a quick pass.
    reps = max(1, int(os.environ.get("BENCH_REPS", "3")))
    # Safety valve: if the suite is running long (noisy host), stop doing
    # extra reps so the harness never risks an external timeout.
    budget = float(os.environ.get("BENCH_BUDGET_SEC", "480"))
    t_suite = time.perf_counter()
    timings: dict[str, float] = {}
    for name in names:
        best = None
        for rep in range(reps):
            if rep > 0 and time.perf_counter() - t_suite > budget:
                break
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    result = {
        "metric": "total_query_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
