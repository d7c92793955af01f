"""Per-stage profiler for registered queries (guide §1: measure first).

Runs each named query once (noop sink) in a session with the event log
enabled, then replays the log and prints, per query, the stages sorted by
executor run time: wall, executor CPU, shuffle read/write bytes, spill,
task count, and the first line of the stage's callsite.  This is the
offline stand-in for the Spark UI's Stages tab (spark.ui.enabled=false
here).

Run: python tools/profile_query.py <query> [query ...]  [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod
from stockpulse_batch_realtime_etl_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    parse_only = "--parse-only" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    evdir = "/tmp/spark-events-profile"
    os.makedirs(evdir, exist_ok=True)
    if parse_only:
        walls: dict[str, float] = {}
        _report(args, walls, evdir)
        return
    import shutil

    for f in Path(evdir).glob("*"):
        shutil.rmtree(f) if f.is_dir() else f.unlink()
    spark = get_spark(
        app_name="stockpulse-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # warmup (same treatment as bench.py)
    queries["ohlcv_bars"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(spark.sparkContext.defaultParallelism).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    walls = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"PROFILE::{name}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        walls[name] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    _report(args, walls, evdir)


def _iter_events(evdir: str):
    logs = sorted(Path(evdir).glob("*"), key=lambda p: p.stat().st_mtime)
    ev = logs[-1]
    files = (
        sorted(p for p in ev.glob("events_*")) if ev.is_dir() else [ev]
    )
    for f in files:
        with open(f) as fh:
            for line in fh:
                if line.strip():
                    yield json.loads(line)


def _report(args: list[str], walls: dict, evdir: str) -> None:
    # --- replay the event log -------------------------------------------
    job_desc = {}          # jobId -> description
    job_times = {}         # jobId -> [start_ms, end_ms]
    stage_to_job = {}      # stageId -> jobId
    stage_info = {}        # stageId -> dict
    stage_tasks = {}       # stageId -> aggregated task metrics
    if True:
        for e in _iter_events(evdir):
            et = e.get("Event")
            if et == "SparkListenerJobStart":
                jid = e["Job ID"]
                job_desc[jid] = e.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                job_times[jid] = [e.get("Submission Time", 0), 0]
                for s in e.get("Stage Infos", []):
                    stage_to_job[s["Stage ID"]] = jid
            elif et == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in job_times:
                    job_times[jid][1] = e.get("Completion Time", 0)
            elif et == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                scopes = []
                for r in si.get("RDD Info", []):
                    sc = r.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except Exception:
                            nm = ""
                        if nm and (not scopes or scopes[-1] != nm):
                            scopes.append(nm)
                stage_info[sid] = {
                    "name": " <- ".join(scopes[:8]) or si.get("Stage Name", ""),
                    "wall_ms": (comp - sub) if sub and comp else 0,
                    "n_tasks": si.get("Number of Tasks", 0),
                }
            elif et == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                agg = stage_tasks.setdefault(
                    sid,
                    {
                        "run_ms": 0,
                        "cpu_ms": 0,
                        "gc_ms": 0,
                        "sr_bytes": 0,
                        "sw_bytes": 0,
                        "spill": 0,
                        "input": 0,
                        "fetch_wait_ms": 0,
                        "ser_ms": 0,
                    },
                )
                agg["run_ms"] += m.get("Executor Run Time", 0)
                agg["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                agg["gc_ms"] += m.get("JVM GC Time", 0)
                agg["spill"] += m.get("Disk Bytes Spilled", 0)
                agg["ser_ms"] += m.get("Result Serialization Time", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                agg["sr_bytes"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                agg["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                agg["sw_bytes"] += sw.get("Shuffle Bytes Written", 0)
                inp = m.get("Input Metrics") or {}
                agg["input"] += inp.get("Bytes Read", 0)

    by_query: dict[str, list[int]] = {}
    for sid, jid in stage_to_job.items():
        d = job_desc.get(jid, "")
        if d.startswith("PROFILE::") and sid in stage_info:
            by_query.setdefault(d[len("PROFILE::"):], []).append(sid)

    def mb(x: int) -> str:
        return f"{x / 1e6:8.1f}"

    for name in args:
        sids = by_query.get(name, [])
        print(f"\n=== {name}  wall={walls.get(name, 0):.2f}s "
              f"stages={len(sids)} ===")
        jids = sorted(
            j for j, d in job_desc.items()
            if d == f"PROFILE::{name}" and j in job_times
        )
        if jids:
            tot_job = sum(
                (job_times[j][1] - job_times[j][0]) / 1000 for j in jids
            )
            gaps = sum(
                max(0, job_times[j][0] - job_times[jp][1]) / 1000
                for jp, j in zip(jids, jids[1:])
            )
            print(
                f"  jobs={len(jids)} job-wall={tot_job:.2f}s "
                f"inter-job gaps={gaps:.2f}s"
            )
            for jp, j in zip(jids, jids[1:]):
                g = (job_times[j][0] - job_times[jp][1]) / 1000
                if g > 0.25:
                    print(f"    gap {g:5.2f}s before job {j}")
        rows = []
        for sid in sids:
            si = stage_info[sid]
            tm = stage_tasks.get(sid, {})
            rows.append((tm.get("run_ms", 0), sid, si, tm))
        rows.sort(reverse=True)
        tot_run = sum(r[0] for r in rows)
        print(f"  total executor-run {tot_run/1000:.1f}s; per-stage top 14:")
        print(
            "  stage  wall_s  run_s   cpu_s  gc_s fetchW  spillMB   "
            "shufR_MB  shufW_MB  inMB  ntask  name"
        )
        for run_ms, sid, si, tm in rows[:14]:
            print(
                f"  {sid:5d} {si['wall_ms']/1000:7.2f} {run_ms/1000:6.1f} "
                f"{tm.get('cpu_ms',0)/1000:7.1f} {tm.get('gc_ms',0)/1000:5.1f} "
                f"{tm.get('fetch_wait_ms',0)/1000:5.1f} "
                f"{tm.get('spill',0)/1e6:8.1f} {mb(tm.get('sr_bytes',0))} "
                f"{mb(tm.get('sw_bytes',0))} {mb(tm.get('input',0))} "
                f"{si['n_tasks']:5d}  {si['name'][:60]}"
            )


if __name__ == "__main__":
    main()
