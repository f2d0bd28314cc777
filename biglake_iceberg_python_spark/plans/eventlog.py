"""Spark event-log parsing for per-job/stage attribution (guide §1/§7).

Shared by ``scripts/profile_query.py`` (interactive profiling) and
``bench.py``'s optional stage-summary stderr block (round-13 verdict #7:
at sf0.1 the driver's 8-vs-32-core scaling ratios are swamped by fixed
per-query costs, so "parallelises at scale" needs per-stage task counts
and max single-task times to be auditable from the artifact).
"""

from __future__ import annotations

import glob
import json
import os


def parse_event_log(path: str) -> list[dict]:
    """Event log (file or Spark-4 rolling dir) → list of completed jobs:
    ``{id, desc, t0, wall, stages: [{sid, name, wall, n_tasks, task_sum,
    task_max}]}`` sorted by job id. Skipped stages (reused exchanges) are
    omitted from a job's stage list."""
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    tasks: dict[int, list[float]] = {}
    if os.path.isdir(path):  # rolling event-log dir (eventlog_v2_*)
        parts = sorted(
            p
            for p in glob.glob(os.path.join(path, "*"))
            if os.path.basename(p).startswith("events_")
        )
    else:
        parts = [path]
    for part in parts:
        _parse_one(part, jobs, stages, tasks)
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        st = []
        for sid in sorted(j["stages"]):
            if sid not in stages:
                continue
            s = stages[sid]
            ts = tasks.get(sid, [])
            st.append(
                {
                    "sid": sid,
                    "name": s["name"],
                    "wall": round(s["t1"] - s["t0"], 3),
                    "n_tasks": s["n_tasks"],
                    "task_sum": round(sum(ts), 3),
                    "task_max": round(max(ts), 3) if ts else 0.0,
                }
            )
        out.append(
            {
                "id": jid,
                "desc": j["desc"],
                "t0": j["t0"],
                "wall": round(j["t1"] - j["t0"], 3),
                "stages": st,
            }
        )
    return out


def _parse_one(path: str, jobs: dict, stages: dict, tasks: dict) -> None:
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "id": jid,
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "t0": ev["Submission Time"] / 1000.0,
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif kind == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"] / 1000.0
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si.get("Name", ""),
                    "n_tasks": si.get("Number of Tasks", 0),
                    "t0": si.get("Submission Time", 0) / 1000.0,
                    "t1": si.get("Completion Time", 0) / 1000.0,
                }
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                dur = (
                    ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                ) / 1000.0
                tasks.setdefault(sid, []).append(dur)


def summarize_window(
    jobs: list[dict], t0: float, t1: float
) -> dict:
    """Aggregate the jobs whose submission falls in [t0, t1]: total job
    wall, gap time, stage count, total tasks, and the single largest
    stage by task_sum (its n_tasks + task_max are the parallelism/skew
    readout)."""
    sel = [j for j in jobs if t0 - 0.05 <= j["t0"] <= t1 + 0.05]
    jw = sum(j["wall"] for j in sel)
    all_stages = [s for j in sel for s in j["stages"]]
    top = max(all_stages, key=lambda s: s["task_sum"], default=None)
    return {
        "n_jobs": len(sel),
        "job_wall": round(jw, 3),
        "gap": round(max(0.0, (t1 - t0) - jw), 3),
        "n_stages": len(all_stages),
        "n_tasks": sum(s["n_tasks"] for s in all_stages),
        "top_stage": top,
    }
