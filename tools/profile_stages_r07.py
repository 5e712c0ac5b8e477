#!/usr/bin/env python3
"""Round-7 stage-level CPU attribution: one full 200k build with the
short-query precompute, then pull per-stage executorRunTime /
executorCpuTime from the local Spark UI REST API (guide §7.1 — the
programmatic equivalent of reading the Stages tab). Writes
_work/prof_stages_r07.json and prints the top stages by run time."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "_work", "prof_idx_200k")


def main() -> None:
    from infidex_spark.build.indexer import build_index
    from infidex_spark.session import get_spark
    from infidex_spark.webtext import generate_webtext, with_doc_ids

    n_docs = int(os.environ.get("PROF_DOCS", "200000"))
    spark = get_spark(
        app_name="prof-stages-r07", cpus=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    docs = (
        with_doc_ids(generate_webtext(spark, n_docs, seed=42))
        .selectExpr("doc_id", "doc_id as doc_key", "text")
        .persist()
    )
    docs.count()

    t0 = time.monotonic()
    m = build_index(
        spark, docs, OUT, n_buckets=32, salts=8, short_precompute=True,
    )
    wall = round(time.monotonic() - t0, 2)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        jobs = json.load(r)
    stage_desc: dict[int, str] = {}
    for j in jobs:
        d = j.get("description") or j.get("name", "")
        for sid in j.get("stageIds", []):
            stage_desc.setdefault(sid, d)
    rows = []
    for s in stages:
        if s.get("status") not in ("COMPLETE",):
            continue
        rows.append(
            {
                "stageId": s["stageId"],
                "name": s.get("name", "")[:90],
                "desc": (
                    s.get("description")
                    or stage_desc.get(s["stageId"], "")
                )[:60],
                "tasks": s.get("numCompleteTasks", 0),
                "runTime_s": round(s.get("executorRunTime", 0) / 1000, 2),
                "cpuTime_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            }
        )
    rows.sort(key=lambda r: -r["runTime_s"])
    total_run = sum(r["runTime_s"] for r in rows)
    total_cpu = sum(r["cpuTime_s"] for r in rows)
    res = {
        "n_docs": n_docs,
        "build_wall": wall,
        "step_secs": m["step_secs"],
        "aux_step_secs": m["aux_step_secs"],
        "aux_step_starts": m["aux_step_starts"],
        "total_executorRunTime_s": round(total_run, 1),
        "total_executorCpuTime_s": round(total_cpu, 1),
        "stages": rows,
    }
    os.makedirs(os.path.join(REPO, "_work"), exist_ok=True)
    with open(os.path.join(REPO, "_work", "prof_stages_r07.json"), "w") as f:
        json.dump(res, f, indent=1)
    by_desc: dict[str, float] = {}
    for r in rows:
        by_desc[r["desc"]] = by_desc.get(r["desc"], 0.0) + r["runTime_s"]
    res["runTime_by_job"] = dict(
        sorted(by_desc.items(), key=lambda kv: -kv[1])
    )
    print(f"wall {wall}s  executorRunTime {total_run:.0f}s  cpu {total_cpu:.0f}s")
    for k, v in res["runTime_by_job"].items():
        print(f"  {v:8.1f}s  {k}")
    for r in rows[:40]:
        print(
            f"{r['runTime_s']:8.1f}s run {r['cpuTime_s']:8.1f}s cpu "
            f"{r['tasks']:4d}t  in {r['input_mb']:7.1f}MB  "
            f"sr {r['sh_read_mb']:6.1f}  sw {r['sh_write_mb']:6.1f}  "
            f"[{r['stageId']}] {r['name']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
