#!/usr/bin/env python
"""Summarize a Spark event log: per-job wall, task-time sum, utilization
(task core-seconds / (wall * cores)), GC share, gaps between jobs.

Usage: python scripts/analyze_eventlog.py <eventlog-dir-or-file> <cores>
"""
from __future__ import annotations

import json
import os
import sys


def main() -> None:
    path, cores = sys.argv[1], int(sys.argv[2])
    if os.path.isdir(path):
        cands = [os.path.join(path, f) for f in os.listdir(path)]
        path = max(cands, key=os.path.getmtime)
        if os.path.isdir(path):  # eventlog_v2 rolling dir
            files = [os.path.join(path, f) for f in os.listdir(path)
                     if "events" in f]
            path = max(files, key=os.path.getmtime)
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    app_start = app_end = None
    if path.endswith(".zstd"):
        import io

        try:
            import zstandard
            opener = io.TextIOWrapper(
                zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
            )
        except ImportError:
            import subprocess
            opener = io.StringIO(subprocess.run(
                ["zstd", "-dc", path], capture_output=True, text=True
            ).stdout)
    else:
        opener = open(path)
    with opener as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerJobStart":
                j = ev["Job ID"]
                jobs[j] = {"start": ev["Submission Time"], "end": None,
                           "task_ms": 0, "gc_ms": 0, "cpu_ms": 0,
                           "tasks": 0, "max_task_ms": 0,
                           "desc": (ev.get("Properties") or {}).get(
                               "spark.job.description", "")[:60]}
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = j
            elif e == "SparkListenerJobEnd":
                j = ev["Job ID"]
                if j in jobs:
                    jobs[j]["end"] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                j = stage_to_job.get(sid)
                if j is None or j not in jobs:
                    continue
                info = ev.get("Task Info", {})
                dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
                m = ev.get("Task Metrics") or {}
                jobs[j]["task_ms"] += dur
                jobs[j]["tasks"] += 1
                jobs[j]["max_task_ms"] = max(jobs[j]["max_task_ms"], dur)
                jobs[j]["gc_ms"] += m.get("JVM GC Time", 0)
                jobs[j]["cpu_ms"] += (m.get("Executor CPU Time", 0)) // 1_000_000

    total_wall = 0.0
    total_task = 0.0
    rows = []
    prev_end = None
    gap_total = 0.0
    for j in sorted(jobs):
        d = jobs[j]
        if d["end"] is None:
            continue
        wall = (d["end"] - d["start"]) / 1000.0
        if prev_end is not None:
            gap_total += max(0.0, (d["start"] - prev_end) / 1000.0)
        prev_end = d["end"]
        util = d["task_ms"] / 1000.0 / max(wall * cores, 1e-9)
        total_wall += wall
        total_task += d["task_ms"] / 1000.0
        rows.append((j, wall, d["tasks"], util,
                     d["gc_ms"] / max(d["task_ms"], 1), d["max_task_ms"] / 1000.0,
                     d["cpu_ms"] / max(d["task_ms"], 1), d["desc"]))
    rows.sort(key=lambda r: -r[1])
    print(f"{'job':>4} {'wall_s':>7} {'tasks':>6} {'util':>5} {'gc%':>5} "
          f"{'maxtask':>8} {'cpu/task':>8}  desc")
    for j, wall, tasks, util, gc, mx, cpu, desc in rows[:25]:
        print(f"{j:>4} {wall:>7.1f} {tasks:>6} {util:>5.2f} {gc:>5.2f} "
              f"{mx:>8.1f} {cpu:>8.2f}  {desc}")
    app_wall = (app_end - app_start) / 1000.0 if app_start and app_end else None
    print(f"\njobs wall sum: {total_wall:.1f}s  task core-s: {total_task:.1f}"
          f"  overall util vs jobs-wall: {total_task/(total_wall*cores):.2f}")
    print(f"inter-job gap total: {gap_total:.1f}s")
    if app_wall:
        print(f"app wall: {app_wall:.1f}s  util vs app-wall: "
              f"{total_task/(app_wall*cores):.2f}")


if __name__ == "__main__":
    main()
