"""Dump `.explain("formatted")` for the r16-touched queries into
plans/r16/<query>_<tag>.txt (tag = before/after; run from the matching
tree).  Usage: python tools/dump_r16_plans.py <tag> [outdir]"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod
from stockpulse_batch_realtime_etl_spark.plans.assertions import (
    formatted_plan,
)
from stockpulse_batch_realtime_etl_spark.session import get_spark

QUERIES = [
    "semantic_dedup",
    "semdedup_recall_report",
    "ann_recall_report",
    "revenue_cube",
    "revenue_rollup",
    "bpe_learned_merges",
    "streaming_metrics_summary",
    "language_id",
    "mixture_sample",
]


def main() -> None:
    tag = sys.argv[1]
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "plans/r16")
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump-r16-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name in QUERIES:
        df = queries[name](spark, sf_dir)
        plan = formatted_plan(df)
        (outdir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
