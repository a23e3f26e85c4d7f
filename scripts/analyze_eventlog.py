"""Summarize a Spark event log: per-job wall, task time, CPU, GC,
and the driver-side gaps between jobs.

Usage: python scripts/analyze_eventlog.py <eventlog-file-or-dir>

Feeds the scaling-efficiency analysis (BENCH/BASELINE.md): comparing
local[2] vs local[8] logs separates the three causes of sub-ideal
scaling — (a) task CPU inflation (memory/GC pressure), (b) wave
quantization / idle cores inside stages, (c) the serial driver floor
(gaps between jobs: planning, barrier bookkeeping, Python driver
code). Produce the logs by running any job with
SPARK_GRAFT_EVENTLOG_DIR=<dir> (session.py hook).
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def analyze(path: str) -> dict:
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    per_job = defaultdict(lambda: {"task_ms": 0, "cpu_ms": 0, "gc_ms": 0,
                                   "tasks": 0})
    app_start = app_end = None
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        t = ev.get("Event")
        if t == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif t == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif t == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "start": ev["Submission Time"],
                "end": None,
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:48],
            }
            for sid in ev.get("Stage IDs", []):
                stage_to_job[sid] = jid
        elif t == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif t == "SparkListenerTaskEnd":
            jid = stage_to_job.get(ev["Stage ID"])
            if jid is None:
                continue
            m = ev.get("Task Metrics") or {}
            info = ev.get("Task Info") or {}
            agg = per_job[jid]
            agg["tasks"] += 1
            agg["task_ms"] += (info.get("Finish Time", 0)
                               - info.get("Launch Time", 0))
            agg["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
            agg["gc_ms"] += m.get("JVM GC Time", 0)

    rows = []
    prev_end = app_start
    gap_total = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["end"] is None:
            continue
        gap = max(0, j["start"] - prev_end) if prev_end else 0
        gap_total += gap
        agg = per_job[jid]
        rows.append(
            {
                "job": jid,
                "desc": j["desc"],
                "wall_s": round((j["end"] - j["start"]) / 1000, 2),
                "gap_before_s": round(gap / 1000, 2),
                "task_s": round(agg["task_ms"] / 1000, 1),
                "cpu_s": round(agg["cpu_ms"] / 1000, 1),
                "gc_s": round(agg["gc_ms"] / 1000, 1),
                "tasks": agg["tasks"],
            }
        )
        prev_end = j["end"]
    total_wall = ((app_end or prev_end) - app_start) / 1000 if app_start else 0
    return {
        "file": os.path.basename(path),
        "app_wall_s": round(total_wall, 1),
        "job_wall_s": round(sum(r["wall_s"] for r in rows), 1),
        "driver_gap_s": round(gap_total / 1000, 1),
        "task_s": round(sum(r["task_s"] for r in rows), 1),
        "cpu_s": round(sum(r["cpu_s"] for r in rows), 1),
        "gc_s": round(sum(r["gc_s"] for r in rows), 1),
        "jobs": rows,
    }


def main() -> None:
    target = sys.argv[1]
    files = (
        [os.path.join(target, f) for f in sorted(os.listdir(target))
         if not f.startswith(".")]
        if os.path.isdir(target)
        else [target]
    )
    for f in files:
        s = analyze(f)
        top = sorted(s["jobs"], key=lambda r: -r["wall_s"])[:8]
        print(json.dumps({k: v for k, v in s.items() if k != "jobs"}))
        for r in top:
            print("  ", json.dumps(r))


if __name__ == "__main__":
    main()
