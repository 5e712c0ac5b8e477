"""Spark event-log core-occupancy analyzer.

Parses a Spark event log (the rolling zstd layout under
spark.eventLog.dir) and reports, per second of the application's task
span, how many task slots were actually running — the direct check for
scheduling/serial-fraction defects in the N->4N scaling analysis: if
utilization is high (>0.9) at the HIGH parallelism level, the DAG keeps
every core busy and any efficiency shortfall is per-core throughput
(see tools/hostbw.py), not idleness.

Usage: python tools/occupancy.py <eventlog-dir-or-file> <n_cores>
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import numpy as np


def _lines(path: str):
    files = [path]
    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "events_*"))
            or glob.glob(os.path.join(path, "eventlog_v2_*", "events_*"))
        )
    for f in files:
        if f.endswith(".zstd"):
            out = subprocess.run(
                ["zstd", "-d", "-c", f], capture_output=True, text=True
            )
            yield from out.stdout.splitlines()
        else:
            with open(f) as fh:
                yield from fh


def analyze(path: str, n_cores: int) -> dict:
    tasks: list[tuple[int, int, int]] = []
    stages: dict[int, tuple[str, int]] = {}
    for line in _lines(path):
        try:
            e = json.loads(line)
        except Exception:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerTaskEnd":
            ti = e["Task Info"]
            tasks.append((ti["Launch Time"], ti["Finish Time"], e["Stage ID"]))
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = (
                si["Stage Name"].split("\n")[0][:70],
                si["Number of Tasks"],
            )
    if not tasks:
        raise SystemExit("no tasks in event log")
    t0 = min(t[0] for t in tasks)
    t1 = max(t[1] for t in tasks)
    dur = (t1 - t0) / 1000
    occ = np.zeros(int(dur) + 2)
    per_stage: dict[int, float] = {}
    for l, f, sid in tasks:
        a, b = (l - t0) / 1000, (f - t0) / 1000
        per_stage[sid] = per_stage.get(sid, 0.0) + (b - a)
        ia, ib = int(a), int(b)
        if ia == ib:
            occ[ia] += b - a
        else:
            occ[ia] += ia + 1 - a
            occ[ia + 1 : ib] += 1
            occ[ib] += b - ib
    return {
        "n_tasks": len(tasks),
        "span_sec": round(dur, 1),
        "utilization": round(float(occ.sum()) / (n_cores * dur), 3),
        "occupancy_10s": [round(float(occ[s : s + 10].mean()), 1)
                          for s in range(0, len(occ), 10)],
        "top_stages": [
            {"stage": sid, "task_sec": round(ts, 1),
             "n_tasks": stages.get(sid, ("?", 0))[1],
             "name": stages.get(sid, ("?", 0))[0]}
            for sid, ts in sorted(per_stage.items(), key=lambda x: -x[1])[:12]
        ],
    }


if __name__ == "__main__":
    print(json.dumps(analyze(sys.argv[1], int(sys.argv[2])), indent=2))
